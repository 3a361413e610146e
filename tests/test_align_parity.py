"""Golden parity for the alignment nets vs the reference torch models."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/evaluation/face_align/PIPNet")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from celebbasis_tpu.align.faceboxes import (FaceBoxesV2, decode_boxes,  # noqa: E402
                                            prior_boxes)
from celebbasis_tpu.utils.bridge_align import convert_faceboxes  # noqa: E402

ATOL = 3e-4


def test_faceboxes_v2_parity():
    from FaceBoxesV2.utils.faceboxes import FaceBoxesV2 as RefNet
    torch.manual_seed(0)
    ref = RefNet("test", None, 2).eval()
    # randomize BN stats so the test exercises them
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        loc_ref, conf_ref = ref(x)

    params = convert_faceboxes(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    net = FaceBoxesV2()
    loc, conf = jax.jit(net.apply)(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(loc), loc_ref.numpy(),
                               atol=ATOL, rtol=1e-3)
    # reference V2 emits conf without the batch dim (view(-1, num_classes))
    np.testing.assert_allclose(np.asarray(conf)[0],
                               conf_ref.numpy().reshape(-1, 2),
                               atol=ATOL, rtol=1e-3)


def test_priorbox_parity():
    from FaceBoxesV2.utils.prior_box import PriorBox
    from FaceBoxesV2.utils.config import cfg as ref_cfg
    ref = PriorBox(ref_cfg, image_size=(230, 170)).forward().numpy()
    got = prior_boxes((230, 170))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_decode_parity():
    from FaceBoxesV2.utils.box_utils import decode
    rng = np.random.default_rng(0)
    loc = rng.standard_normal((40, 4)).astype(np.float32) * 0.3
    pri = np.abs(rng.standard_normal((40, 4)).astype(np.float32)) * 0.3 + 0.2
    ref = decode(torch.from_numpy(loc), torch.from_numpy(pri),
                 [0.1, 0.2]).numpy()
    got = np.asarray(decode_boxes(jnp.asarray(loc), jnp.asarray(pri)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pipnet_resnet_parity():
    """Our backbone+heads vs the reference Pip_resnet101 on a small resnet.

    torchvision is absent in this image; tests/_stubs/torch_resnet.py is a
    hand-built torch ResNet with torchvision's exact Bottleneck structure and
    state-dict naming, so the reference module wraps it unchanged.
    """
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_stubs"))
    import torch_resnet
    from lib.networks import Pip_resnet101
    from celebbasis_tpu.align.pipnet import PIPNet, PIPNetConfig
    from celebbasis_tpu.utils.bridge_align import convert_pipnet

    torch.manual_seed(1)
    # width 64 is forced by Pip_resnet101's hardcoded 2048-ch heads;
    # (2,2,2,2) exercises both downsample and identity Bottleneck paths
    resnet = torch_resnet.resnet(layers=(2, 2, 2, 2))
    ref = Pip_resnet101(resnet, num_nb=10, num_lms=98, input_size=128,
                        net_stride=32).eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        ref_outs = ref(x)

    cfg = PIPNetConfig(layers=(2, 2, 2, 2), input_size=128)
    params = convert_pipnet({k: v.numpy() for k, v in ref.state_dict().items()},
                            cfg)
    net = PIPNet(cfg)
    outs = jax.jit(net.apply)(params,
                              jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for got, want in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want.numpy(), atol=5e-4, rtol=1e-3)


def _rand_bn_stats(mod):
    for m in mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)


def _pipnet_golden(ref, cfg, size=64, atol=5e-4):
    """Bridge ref's state_dict into our PIPNet and compare all five heads."""
    import jax
    from celebbasis_tpu.align.pipnet import PIPNet
    from celebbasis_tpu.utils.bridge_align import convert_pipnet
    ref = ref.eval()
    _rand_bn_stats(ref)
    x = torch.randn(1, 3, size, size)
    with torch.no_grad():
        ref_outs = ref(x)
    params = convert_pipnet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    outs = jax.jit(PIPNet(cfg).apply)(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for got, want in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want.numpy(), atol=atol, rtol=1e-3)


@pytest.mark.parametrize("net_stride", [32, 16, 64])
def test_pipnet_resnet18_parity(net_stride):
    """Pip_resnet18 (BasicBlock + net_stride conv/deconv extras) golden."""
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_stubs"))
    import torch_resnet
    from lib.networks import Pip_resnet18
    from celebbasis_tpu.align.pipnet import PIPNetConfig

    torch.manual_seed(2 + net_stride)
    resnet = torch_resnet.resnet(layers=(2, 2, 2, 2), block="basic")
    ref = Pip_resnet18(resnet, num_nb=10, num_lms=98, input_size=64,
                       net_stride=net_stride)
    # the reference initializes layer5/6 and deconv1 weights to ~0
    # (std=0.001, networks.py:235-264) — re-randomize so the parity test
    # actually exercises the stride-extra path
    for name, p in ref.named_parameters():
        if any(s in name for s in ("layer5", "layer6", "deconv1")):
            p.data.normal_(0, 0.05)
    cfg = PIPNetConfig.resnet18(input_size=64, net_stride=net_stride)
    _pipnet_golden(ref, cfg)


def test_pipnet_mbnetv2_parity():
    """Pip_mbnetv2 over the torchvision-layout MobileNetV2 stub, golden."""
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_stubs"))
    import torch_mbnetv2
    from lib.networks import Pip_mbnetv2
    from celebbasis_tpu.align.pipnet import PIPNetConfig

    torch.manual_seed(3)
    ref = Pip_mbnetv2(torch_mbnetv2.mobilenet_v2(), num_nb=10, num_lms=98,
                      input_size=64, net_stride=32)
    _pipnet_golden(ref, PIPNetConfig.mbnetv2(input_size=64))


def test_pipnet_mbnetv3_parity():
    """Pip_mbnetv3 over the reference's own mobilenetv3_large, golden."""
    from lib.mobilenetv3 import mobilenetv3_large
    from lib.networks import Pip_mbnetv3
    from celebbasis_tpu.align.pipnet import PIPNetConfig

    torch.manual_seed(4)
    ref = Pip_mbnetv3(mobilenetv3_large(), num_nb=10, num_lms=98,
                      input_size=64, net_stride=32)
    _pipnet_golden(ref, PIPNetConfig.mbnetv3(input_size=64), atol=1e-3)
