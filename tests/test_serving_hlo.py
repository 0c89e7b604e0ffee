"""Structural audit of the view-sharded multi-chip serving program.

PERF.md's multi-chip projection (~30-45 fps per 5-chip group) rests on
the story that view-sharding the inference program costs one bounded set
of cross-view collectives per decoder layer (the mean-over-views feature
fusion, the view-confidence softmax, and triangulation all need every
view). The reference has no model parallelism at all (SURVEY.md §2.8) —
this is the rebuild's designed advantage, so make it checkable: lower
the view-sharded eval program on the virtual CPU mesh and assert the
optimized HLO's collective count is small and scales LINEARLY with the
number of decoder layers (VERDICT r3 weak #6).
"""

import re

import jax
import pytest

from mvgformer_tpu.config import load_config
from mvgformer_tpu.core.train import make_eval_step
from mvgformer_tpu.data.synthetic import make_batch
from mvgformer_tpu.models.mvgformer import MVGFormer
from mvgformer_tpu.parallel import make_mesh_2d, shard_batch
from mvgformer_tpu.parallel.mesh import replicated

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def _tiny_cfg(num_layers):
    cfg = load_config()
    cfg.NETWORK.IMAGE_SIZE = [96, 64]
    cfg.DECODER.d_model = 32
    cfg.DECODER.dim_feedforward = 64
    cfg.DECODER.nhead = 4
    cfg.DECODER.dec_n_points = 2
    cfg.DECODER.num_decoder_layers = num_layers
    cfg.DECODER.num_instance = 16
    cfg.DATASET.CAMERA_NUM = 4  # sharded 2-way over the 'view' axis
    cfg.MULTI_PERSON.MAX_PEOPLE_NUM = 4
    cfg.POSE_RESNET.NUM_DECONV_FILTERS = [32, 32, 32]
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    return cfg


def _collective_count(num_layers):
    cfg = _tiny_cfg(num_layers)
    model = MVGFormer(cfg=cfg)
    mesh = make_mesh_2d(2, 2)
    batch = make_batch(cfg, batch_size=2, seed=0, num_people=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    repl = replicated(mesh)
    params = jax.device_put(variables["params"], repl)
    batch_stats = jax.device_put(variables["batch_stats"], repl)
    sharded = shard_batch(batch, mesh, view_axis="view")

    eval_step = make_eval_step(cfg, model, threshold=0.1)
    hlo = eval_step.lower(params, batch_stats, sharded).compile().as_text()
    counts = {}
    for op in COLLECTIVES:
        # count op *instructions* (e.g. "all-reduce(", "all-reduce-start("),
        # not strings inside metadata
        counts[op] = len(re.findall(r"^\s*(?:ROOT\s+)?%?[\w.-]+ = \S+ "
                                    + op, hlo, flags=re.M))
    return counts


@pytest.mark.slow
def test_view_sharded_serving_collectives_scale_linearly():
    c2 = _collective_count(2)
    c4 = _collective_count(4)
    total2 = sum(c2.values())
    total4 = sum(c4.values())
    # the program must actually communicate across the view axis
    assert total2 > 0, c2
    # linear growth in decoder layers: adding 2 layers adds an equal
    # increment per layer, no superlinear blowup
    delta = total4 - total2
    assert delta >= 0, (c2, c4)
    assert delta % 2 == 0, (c2, c4)
    per_layer = delta // 2
    # the claimed story: a bounded handful of cross-view collectives per
    # layer (feature-fusion mean, view-confidence softmax, triangulation,
    # + partitioner bookkeeping), not a blowup
    assert per_layer <= 8, (per_layer, c2, c4)
    base = total2 - 2 * per_layer
    assert base >= 0, (per_layer, c2, c4)
    print(f"per-layer collectives: {per_layer}, layer-independent: {base}, "
          f"L=2 {c2}, L=4 {c4}")
