"""Model layer: backbone, decoders, top-level MVGFormer, matcher, losses."""
