"""Training/eval core: criterion, train step, NMS, metrics."""
