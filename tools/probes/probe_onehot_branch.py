"""CPU branch-verification companion to probe_onehot_ledger.py.

The ledger probe times the production sampler on the TPU with
MVG_SAMPLER_IMPL=onehot, where the lax.cond inside
onehot_gather.deform_gather_reduce picks the sorted-window path iff the
max per-pair escape count <= E_CAP. jax.debug.print is unavailable
through the axon relay (no host callbacks), so this script re-runs the
SAME inputs (same PRNG keys/shapes as the ledger probe) on CPU in
interpret mode with MVG_ONEHOT_DEBUG=1, printing the actual escape
counts — recording which branch the TPU timing measured, not assuming.

Run:  MVGFORMER_FORCE_PLATFORM=cpu PYTHONPATH=/root/repo \
          python tools/probes/probe_onehot_branch.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

os.environ["MVG_SAMPLER_IMPL"] = "onehot"
os.environ["MVG_ONEHOT_INTERPRET"] = "1"
os.environ["MVG_ONEHOT_DEBUG"] = "1"

from probe_onehot_ledger import clustered_locations  # noqa: E402


def main():
    from mvgformer_tpu.ops import sampling as S

    rng = jax.random.PRNGKey(0)
    N, H, D = 5, 8, 32
    SHAPES = ((128, 240), (64, 120), (32, 60))
    total_hw = sum(h * w for h, w in SHAPES)
    value = jax.random.normal(rng, (N, total_hw, H, D), jnp.bfloat16)
    P = 4
    for tag, loc in (
        ("uniform", jax.random.uniform(rng, (N, 15360, H, 3, P, 2))),
        ("clustered", clustered_locations(
            jax.random.PRNGKey(7), N, 15360, H, 3, P)),
    ):
        aw = jax.random.uniform(rng, (N, 15360, H, 3, P), jnp.bfloat16)
        print(f"--- {tag}", flush=True)
        out = S.deform_sample_corner(value, SHAPES, loc, aw)
        jax.block_until_ready(out)


if __name__ == "__main__":
    main()
