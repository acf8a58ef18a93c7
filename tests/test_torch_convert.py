"""Torch nnU-Net checkpoint conversion: forward parity.

Builds a faithful PyTorch replica of the fork's Generic_UNet (same module
nesting, so state_dict keys match the real checkpoints:
conv_blocks_context.{s}.blocks.{b}, bottleneck Sequential pair, tu.{u},
conv_blocks_localization.{u}.{0,1}, seg_outputs.{u}), randomizes it, saves
nnU-Net-style model_best.model + plans.pkl, converts via DeepWMH_convert's
machinery, and asserts the JAX forward reproduces the torch forward."""

import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepwmh_tpu.unet.model import UNet3D  # noqa: E402
from deepwmh_tpu.unet.torch_convert import (  # noqa: E402
    convert_nnunet_model,
    find_nnunet_checkpoint,
    plan_from_nnunet_plans,
)

BASE = 4
POOLS = [[2, 2, 2], [1, 2, 2]]
CONVS = [[3, 3, 3], [3, 3, 3], [3, 3, 3]]
NUM_CLASSES = 2  # background + lesion


def _feats(stage):
    return min(BASE * 2**stage, 320)


class _Block(tnn.Module):
    """ConvDropoutNormNonlin: conv -> InstanceNorm3d(affine) -> LeakyReLU."""

    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, tuple(k), tuple(stride),
                               padding=tuple(x // 2 for x in k))
        self.instnorm = tnn.InstanceNorm3d(cout, affine=True, eps=1e-5)
        self.lrelu = tnn.LeakyReLU(0.01, inplace=True)

    def forward(self, x):
        return self.lrelu(self.instnorm(self.conv(x)))


class _Stacked(tnn.Module):
    def __init__(self, blocks):
        super().__init__()
        self.blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class _GenericUNetReplica(tnn.Module):
    def __init__(self):
        super().__init__()
        P = len(POOLS)
        ctx = []
        cin = 1
        for s in range(P):
            stride = POOLS[s - 1] if s > 0 else (1, 1, 1)
            ctx.append(_Stacked([
                _Block(cin, _feats(s), CONVS[s], stride),
                _Block(_feats(s), _feats(s), CONVS[s], (1, 1, 1)),
            ]))
            cin = _feats(s)
        # bottleneck: Sequential of two single-block StackedConvLayers
        ctx.append(tnn.Sequential(
            _Stacked([_Block(cin, _feats(P), CONVS[P], POOLS[P - 1])]),
            _Stacked([_Block(_feats(P), _feats(P), CONVS[P], (1, 1, 1))]),
        ))
        self.conv_blocks_context = tnn.ModuleList(ctx)
        tu, loc, heads = [], [], []
        for u in range(P):
            below = _feats(P - u)
            skip = _feats(P - 1 - u)
            pool = POOLS[P - 1 - u]
            tu.append(tnn.ConvTranspose3d(below, skip, tuple(pool),
                                          tuple(pool), bias=False))
            loc.append(tnn.Sequential(
                _Stacked([_Block(2 * skip, skip, CONVS[P - 1 - u], (1, 1, 1))]),
                _Stacked([_Block(skip, skip, CONVS[P - 1 - u], (1, 1, 1))]),
            ))
            heads.append(tnn.Conv3d(skip, NUM_CLASSES, 1, bias=False))
        self.tu = tnn.ModuleList(tu)
        self.conv_blocks_localization = tnn.ModuleList(loc)
        self.seg_outputs = tnn.ModuleList(heads)

    def forward(self, x):
        P = len(POOLS)
        skips = []
        for s in range(P):
            x = self.conv_blocks_context[s](x)
            skips.append(x)
        x = self.conv_blocks_context[P](x)
        segs = []
        for u in range(P):
            x = self.tu[u](x)
            x = torch.cat([x, skips[P - 1 - u]], dim=1)
            x = self.conv_blocks_localization[u](x)
            segs.append(self.seg_outputs[u](x))
        return segs  # deepest first; segs[-1] is full resolution


def _plans_dict():
    return {
        "plans_per_stage": {
            0: {"patch_size": [8, 8, 8], "current_spacing": [2.0, 2.0, 2.0],
                "pool_op_kernel_sizes": [[2, 2, 2]],
                "conv_kernel_sizes": [[3, 3, 3], [3, 3, 3]],
                "batch_size": 2},
            1: {"patch_size": [16, 16, 16],
                "current_spacing": [1.0, 1.0, 1.0],
                "pool_op_kernel_sizes": POOLS,
                "conv_kernel_sizes": CONVS,
                "batch_size": 2,
                "median_patient_size_in_voxels": [32, 32, 32]},
        },
        "base_num_features": BASE,
        "num_classes": NUM_CLASSES - 1,  # nnU-Net counts foreground only
        "num_modalities": 1,
    }


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("conv")
    torch.manual_seed(0)
    net = _GenericUNetReplica().eval()
    # nn.init leaves instnorm scale=1/bias=0; randomize so the test cannot
    # pass with norm params accidentally ignored
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.InstanceNorm3d):
                m.weight.copy_(0.5 + torch.rand_like(m.weight))
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
    # nnU-Net fold-dir layout
    fold = tmp / "nnUNet" / "3d_fullres" / "Task002_FinalModel" / \
        "nnUNetTrainerV2__nnUNetPlansv2.1" / "all"
    fold.mkdir(parents=True)
    torch.save({"epoch": 5, "state_dict": net.state_dict()},
               str(fold / "model_best.model"))
    with open(tmp / "nnUNetPlansv2.1_plans_3D.pkl", "wb") as f:
        pickle.dump(_plans_dict(), f)
    model, plans = find_nnunet_checkpoint(str(tmp))
    out = convert_nnunet_model(model, plans, str(tmp / "pkg"))
    return net, out


def test_plan_from_plans():
    plan = plan_from_nnunet_plans(_plans_dict())
    assert plan.patch_size == [16, 16, 16]
    assert plan.pool_kernels == POOLS
    assert plan.num_classes == NUM_CLASSES
    assert plan.base_features == BASE
    assert plan.pad_style == "torch"


def test_forward_parity(converted):
    net, pkg = converted
    from deepwmh_tpu.unet import checkpoint as ckpt
    from deepwmh_tpu.unet.model import init_params
    from deepwmh_tpu.unet.plan import Plan
    from deepwmh_tpu.unet.release import PLAN_FILE

    plan = Plan.load(os.path.join(pkg, PLAN_FILE))
    # f32 model for exact comparison (the production loader runs bf16)
    model = UNet3D(plan=plan, dtype=jnp.float32)
    template = init_params(model, jax.random.PRNGKey(0))
    params, _ = ckpt.load_params_only(pkg, "model_best", template)

    rng = np.random.RandomState(1)
    # pool-divisible shapes (the network only ever sees those — nnU-Net
    # pads volumes first); even sizes are exactly where torch's symmetric
    # strided-conv padding diverges from XLA SAME, so this fails without
    # pad_style="torch"
    for shape in [(12, 16, 16), (10, 24, 8)]:
        x = rng.rand(1, *shape).astype(np.float32) * 2 - 1
        with torch.no_grad():
            segs = net(torch.from_numpy(x[:, None]))
        want_full = segs[-1].numpy()  # full resolution head
        got = model.apply({"params": params},
                          jnp.asarray(x[..., None]), deep_supervision=True)
        got_full = np.transpose(np.asarray(got[0]), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(got_full, want_full, atol=2e-4, rtol=1e-3)
        # deepest supervision head maps too
        want_deep = segs[0].numpy()
        got_deep = np.transpose(np.asarray(got[-1]), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(got_deep, want_deep, atol=2e-4, rtol=1e-3)


def test_discovery_edge_cases(tmp_path, converted):
    """Review regressions: explicit -p works without auto-discovery,
    ambiguous checkpoints/plans refuse, extra weights are a loud error."""
    from deepwmh_tpu.unet.torch_convert import (
        find_nnunet_model,
        find_nnunet_plans,
        params_from_nnunet_state_dict,
        plan_from_nnunet_plans,
    )

    net, _pkg = converted
    # isolated checkpoint file + plans elsewhere (-p path): no discovery
    lone = tmp_path / "lone"
    lone.mkdir()
    model_file = str(lone / "model_best.model")
    torch.save({"epoch": 1, "state_dict": net.state_dict()}, model_file)
    assert find_nnunet_model(model_file) == model_file
    with pytest.raises(RuntimeError, match="no plans"):
        find_nnunet_plans(model_file)

    # two tasks with the same checkpoint name -> refuse ambiguity
    multi = tmp_path / "multi"
    for task in ("TaskA", "TaskB"):
        d = multi / task / "all"
        d.mkdir(parents=True)
        torch.save({"state_dict": net.state_dict()},
                   str(d / "model_best.model"))
    with pytest.raises(RuntimeError, match="several"):
        find_nnunet_model(str(multi))
    # --which falls through to a uniquely-named checkpoint
    torch.save({"state_dict": net.state_dict()},
               str(multi / "TaskA" / "all" / "model_latest.model"))
    got = find_nnunet_model(str(multi), which="model_latest.model")
    assert got.endswith("TaskA/all/model_latest.model")

    # unmapped extra weights are a loud error, not a silent drop
    plan = plan_from_nnunet_plans(_plans_dict())
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    sd["conv_blocks_context.0.blocks.2.conv.weight"] = \
        np.zeros((4, 4, 3, 3, 3), np.float32)
    with pytest.raises(RuntimeError, match="did not map"):
        params_from_nnunet_state_dict(sd, plan)
    # DataParallel prefixes strip cleanly
    sd_dp = {"module." + k: v.numpy() for k, v in net.state_dict().items()}
    params = params_from_nnunet_state_dict(sd_dp, plan)
    assert "ConvNormAct_0" in params


def test_converted_package_loads_and_predicts(converted):
    _net, pkg = converted
    from deepwmh_tpu.unet.infer import SlidingWindowPredictor
    from deepwmh_tpu.unet.release import load_released_model

    model, params, plan = load_released_model(pkg)
    pred = SlidingWindowPredictor(model, params, plan, tta=False)
    rng = np.random.RandomState(2)
    seg, _fg = pred.predict_case(rng.rand(18, 20, 16).astype(np.float32) * 100,
                                 (1.0, 1.0, 1.0))
    assert np.asarray(seg).shape == (18, 20, 16)


def test_bf16_decisions_match_torch(converted):
    """The production loader runs the converted model at bf16; its argmax
    decisions must agree with the torch f32 model on almost all voxels
    (bit-parity is f32-only, tested above)."""
    net, pkg = converted
    from deepwmh_tpu.unet import checkpoint as ckpt
    from deepwmh_tpu.unet.model import init_params
    from deepwmh_tpu.unet.plan import Plan
    from deepwmh_tpu.unet.release import PLAN_FILE

    plan = Plan.load(os.path.join(pkg, PLAN_FILE))
    model = UNet3D(plan=plan)  # default bf16
    template = init_params(model, jax.random.PRNGKey(0))
    params, _ = ckpt.load_params_only(pkg, "model_best", template)
    rng = np.random.RandomState(3)
    x = rng.rand(1, 12, 16, 16).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = net(torch.from_numpy(x[:, None]))[-1].numpy().argmax(1)
    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(x[..., None]))).argmax(-1)
    agree = float(np.mean(got == want))
    assert agree > 0.98, agree


def test_full_predict_path_matches_torch_sweep(converted):
    """The whole-predict-path equivalence the reference's install contract
    implies (deepwmh/main/install_model.py:91-106): a converted model run
    through OUR full path (resample -> z-score -> Gaussian sliding window
    with mirror TTA -> resample back -> threshold) must produce the same
    segmentation as the torch network pushed through a from-scratch
    replica of the nnU-Net sweep on the same preprocessed volume —
    not just an agreeing single forward."""
    net, pkg = converted
    from deepwmh_tpu.unet import checkpoint as ckpt
    from deepwmh_tpu.unet.infer import (
        ALL_FLIPS,
        SlidingWindowPredictor,
        gaussian_importance_map,
        patch_positions,
    )
    from deepwmh_tpu.unet.model import init_params
    from deepwmh_tpu.unet.plan import Plan
    from deepwmh_tpu.unet.preprocess import (
        pad_to,
        padded_shape,
        preprocess_case,
        resample_to_shape,
    )
    from deepwmh_tpu.unet.release import PLAN_FILE

    plan = Plan.load(os.path.join(pkg, PLAN_FILE))
    model = UNet3D(plan=plan, dtype=jnp.float32)  # f32 for tight comparison
    template = init_params(model, jax.random.PRNGKey(0))
    params, _ = ckpt.load_params_only(pkg, "model_best", template)

    # synthetic head at anisotropic spacing so the resample legs are real
    shape = (18, 26, 22)
    spacing = (1.4, 1.0, 1.0)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt(sum(a**2 for a in g))
    vol = ((r < 0.8) * (200 + 40 * np.random.RandomState(5).rand(*shape))
           ).astype(np.float32)

    # OUR full path, forced onto the patch sweep (the sweep being replicated)
    pred = SlidingWindowPredictor(model, params, plan, tta=True, mode="patch")
    seg_ours, fg_ours = pred.predict_case(vol, spacing)

    # torch replica of the sweep on the SAME preprocessed volume
    pre = np.asarray(preprocess_case(jnp.asarray(vol), spacing, plan))
    patch = tuple(plan.patch_size)
    target = padded_shape(pre.shape, patch)
    padded = np.asarray(pad_to(jnp.asarray(pre), target))
    pos, pos_w = patch_positions(target, patch, 0.5)
    gauss = np.asarray(gaussian_importance_map(patch))
    acc = np.zeros(target + (2,), np.float64)
    wt = np.zeros(target, np.float64)
    for p, w in zip(np.asarray(pos), np.asarray(pos_w)):
        if w == 0:
            continue  # bucket padding
        z, y, x = [int(v) for v in p]
        crop = padded[z:z + patch[0], y:y + patch[1], x:x + patch[2]]
        probs = np.zeros(patch + (2,), np.float64)
        for flips in ALL_FLIPS:
            axes = [a for a, f in enumerate(flips) if f]
            xf = np.flip(crop, axes) if axes else crop
            with torch.no_grad():
                logits = net(torch.from_numpy(
                    np.ascontiguousarray(xf)[None, None]))[-1][0]
            sm = torch.softmax(logits, 0).numpy().transpose(1, 2, 3, 0)
            probs += np.flip(sm, axes) if axes else sm
        probs /= len(ALL_FLIPS)
        acc[z:z + patch[0], y:y + patch[1], x:x + patch[2]] += \
            probs * gauss[..., None]
        wt[z:z + patch[0], y:y + patch[1], x:x + patch[2]] += gauss
    sm_t = acc / np.maximum(wt, 1e-8)[..., None]
    fg_t = sm_t[: pre.shape[0], : pre.shape[1], : pre.shape[2], 1]
    fg_t_orig = np.asarray(
        resample_to_shape(jnp.asarray(fg_t.astype(np.float32)), shape, order=1)
    )
    seg_t = (fg_t_orig > 0.5).astype(np.uint8)

    agree = float(np.mean(np.asarray(seg_ours) == seg_t))
    assert agree > 0.999, "segmentation agreement %.5f" % agree
    np.testing.assert_allclose(
        np.asarray(fg_ours), fg_t_orig, atol=5e-3,
        err_msg="fg probability field diverges from the torch sweep",
    )
