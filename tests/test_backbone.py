"""PoseResNet-50 parity vs the reference torch backbone (random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvgformer_tpu.models.pose_resnet import PoseResNet, convert_torch_state_dict

from oracles import reference_available, _init_paths

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def _build_ref_backbone():
    import torch
    _init_paths()
    import models.pose_resnet as ref_pose_resnet  # type: ignore

    class Cfg:
        pass

    cfg = Cfg()
    cfg.POSE_RESNET = Cfg()
    cfg.POSE_RESNET.NUM_LAYERS = 50
    cfg.POSE_RESNET.DECONV_WITH_BIAS = False
    cfg.POSE_RESNET.NUM_DECONV_LAYERS = 3
    cfg.POSE_RESNET.NUM_DECONV_FILTERS = [256, 256, 256]
    cfg.POSE_RESNET.NUM_DECONV_KERNELS = [4, 4, 4]
    cfg.POSE_RESNET.FINAL_CONV_KERNEL = 1
    cfg.NETWORK = Cfg()
    cfg.NETWORK.NUM_JOINTS = 15
    cfg.NETWORK.PRETRAINED = ""
    torch.manual_seed(0)
    model = ref_pose_resnet.get_pose_net(cfg, is_train=False)
    # give BN non-trivial running stats so parity covers them
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.3)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)
    return model.eval()


@needs_ref
@pytest.mark.slow
def test_backbone_matches_reference():
    import torch
    ref = _build_ref_backbone()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 64, 96).astype(np.float32)  # small NCHW input

    with torch.no_grad():
        theirs = [t.numpy() for t in ref(torch.as_tensor(x),
                                         use_feat_level=[0, 1, 2])]

    model = PoseResNet()
    variables = convert_torch_state_dict(ref.state_dict())
    ours = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       use_feat_level=(0, 1, 2))

    assert len(ours) == len(theirs) == 3
    for o, t in zip(ours, theirs):
        o = np.transpose(np.asarray(o), (0, 3, 1, 2))
        assert o.shape == t.shape
        np.testing.assert_allclose(o, t, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_backbone_shapes():
    """Feature strides 16/8/4 at the Panoptic input size (scaled down)."""
    model = PoseResNet()
    x = jnp.zeros((1, 256, 480, 3))  # 1/2-scale Panoptic input (512, 960)
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 16, 30, 256), (1, 32, 60, 256), (1, 64, 120, 256)]
