"""TPU-only statistical tests of the in-kernel (pltpu.prng) random draws.

The Pallas kernels draw uniforms from raw PRNG bits; a sign-extension bug in
that conversion once made pflip flip ~(1+p)/2 of all pixels and dropout keep
units at (1-p)/2 (see ADVICE r1). CPU interpret mode bypasses pltpu.prng, so
these tests only bite on hardware — run with:

  PYTHONPATH=/root/.axon_site:/root/repo THEANET_TEST_TPU=1 \
      python -m pytest tests/test_tpu_prng_stats.py -q
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="exercises pltpu.prng, which only runs on real TPU",
)


def test_pallas_pflip_rate_on_tpu():
    from theanet_tpu.ops.elastic_pallas import elastic_resample_pallas

    h = w = 28
    yy, xx = np.indices((h, w)).astype(np.float32)
    x = jnp.zeros((20, 1, h, w), jnp.float32)  # identity warp of a zero
    # image -> the output IS the flip mask
    rates = [
        float(jnp.mean(elastic_resample_pallas(
            x, jnp.asarray(yy), jnp.asarray(xx),
            nearest=True, pflip=0.03, seed=s,
        )))
        for s in range(5)
    ]
    mean_rate = float(np.mean(rates))
    # 5 x 15680 Bernoulli(0.03) draws: std of the mean ~ 0.0006
    assert abs(mean_rate - 0.03) < 0.005, rates


def test_fused_tail_dropout_rate_on_tpu():
    from theanet_tpu.ops.fused_mlp import FusedTailSpec, _fwd_impl

    bsz, n_in, n_hid = 32, 128, 512
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(bsz, n_in).astype(np.float32))
    w1 = jnp.asarray(rng.rand(n_in, n_hid).astype(np.float32) * 0.1)
    b1 = jnp.ones((n_hid,), jnp.float32)
    w2 = jnp.asarray(rng.rand(n_hid, 10).astype(np.float32) * 0.1)
    b2 = jnp.zeros((10,), jnp.float32)
    spec = FusedTailSpec(slope=0.1, pdrop=0.5, train=True)
    keeps = [
        float(jnp.mean(_fwd_impl(x, w1, b1, w2, b2, spec, jnp.float32(s))[2]))
        for s in range(5)
    ]
    mean_keep = float(np.mean(keeps))
    assert abs(mean_keep - 0.5) < 0.01, keeps


def test_megafused_matches_unfused_on_tpu():
    """On-chip (not interpret-mode) parity of the fused epoch kernel vs the
    per-layer path: identity augmentation, no dropout, one epoch. Both run
    the MXU's default precision; differences are bf16 rounding of the fused
    kernel's matmul-based data movement plus reduction order — measured
    ~1e-5 relative on costs, gated here at 1e-3."""
    import numpy as np
    from theanet_tpu.model import NeuralNet
    from theanet_tpu.trainer import Trainer

    def net(mega):
        layers = [
            ["InputLayer", {"img_sz": 12}],
            ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                           "mode": "valid", "actvn": "relu05"}],
            ["PoolLayer", {"pool_sz": 2}],
            ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                           "mode": "valid", "actvn": "relu10"}],
            ["PoolLayer", {"pool_sz": 2}],
            ["HiddenLayer", {"n_out": 16, "pdrop": 0, "actvn": "relu01"}],
            ["SoftmaxLayer", {"n_out": 4}],
        ]
        tr_prms = {"SEED": 11, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
                   "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
                   "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
                   "MEGAFUSED": mega}
        return NeuralNet(layers, tr_prms)

    rng = np.random.RandomState(3)
    x = rng.rand(12, 1, 12, 12).astype(np.float32)
    y = rng.randint(0, 4, 12).astype(np.int32)
    tr_m = Trainer(net(True), x, y, x, y)
    assert tr_m._mega is not None
    tr_u = Trainer(net(False), x, y, x, y)
    _, cm, _ = tr_m.run_epoch()
    _, cu, _ = tr_u.run_epoch()
    np.testing.assert_allclose(cm, cu, rtol=1e-3)
    dm, du = tr_m.checkpoint_dict(), tr_u.checkpoint_dict()
    for lm, lu in zip(dm["allwts"], du["allwts"]):
        for wm, wu in zip(lm, lu):
            np.testing.assert_allclose(wm, wu, atol=2e-3)


def test_bf16_megafused_matches_scanned_bf16_on_tpu():
    """COMPUTE_DTYPE=bfloat16 fuses (megastep.common_disqualifiers); on
    hardware BOTH paths round their matmuls through bf16 MXU passes, so
    the gap is bf16-rounding-scale. CPU twin: tests/test_fused_bf16.py."""
    import numpy as np
    from theanet_tpu.model import NeuralNet
    from theanet_tpu.trainer import Trainer

    def net(mega):
        layers = [
            ["InputLayer", {"img_sz": 12}],
            ["ConvLayer", {"num_maps": 2, "filter_sz": 3, "stride": 1,
                           "mode": "valid", "actvn": "relu05"}],
            ["PoolLayer", {"pool_sz": 2}],
            ["ConvLayer", {"num_maps": 3, "filter_sz": 3, "stride": 1,
                           "mode": "valid", "actvn": "relu10"}],
            ["PoolLayer", {"pool_sz": 2}],
            ["HiddenLayer", {"n_out": 16, "pdrop": 0, "actvn": "relu01"}],
            ["SoftmaxLayer", {"n_out": 4}],
        ]
        tr_prms = {"SEED": 11, "BATCH_SZ": 4, "NUM_EPOCHS": 1,
                   "EPOCHS_TO_TEST": 1, "TEST_SAMP_SZ": 4,
                   "INIT_LEARNING_RATE": 0.1, "EPOCHS_TO_HALF_RATE": 2,
                   "COMPUTE_DTYPE": "bfloat16", "MEGAFUSED": mega}
        return NeuralNet(layers, tr_prms)

    rng = np.random.RandomState(3)
    x = rng.rand(12, 1, 12, 12).astype(np.float32)
    y = rng.randint(0, 4, 12).astype(np.int32)
    tr_m = Trainer(net(True), x, y, x, y)
    assert tr_m._mega is not None, "bf16 config must fuse"
    tr_u = Trainer(net(False), x, y, x, y)
    _, cm, _ = tr_m.run_epoch()
    _, cu, _ = tr_u.run_epoch()
    np.testing.assert_allclose(cm, cu, rtol=2e-2, atol=2e-2)
    dm, du = tr_m.checkpoint_dict(), tr_u.checkpoint_dict()
    for lm, lu in zip(dm["allwts"], du["allwts"]):
        for wm, wu in zip(lm, lu):
            np.testing.assert_allclose(wm, wu, atol=1e-2)


def _mega_consistency(make_fn, spec, kshapes, n_batches=8, atol=2e-2):
    """Hardware-vs-interpret trajectory check: the fused kernels inject all
    randomness as bit tensors, so the SAME bits through the Mosaic-compiled
    kernel and the interpret-mode kernel must give the same trajectory up
    to MXU rounding (compute matmuls run bf16 passes on hardware). Catches
    Mosaic miscompiles (roll/layout/masking bugs) that CPU-only tests
    cannot see."""
    from theanet_tpu.ops.megastep import epoch_noise_bits

    rng = np.random.RandomState(0)
    B = spec.batch
    n_tiles = int(getattr(spec, "n_tiles", 1))
    n_steps = n_batches * n_tiles
    kp = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
          for s in kshapes]
    km = [jnp.zeros_like(p) for p in kp]
    x = jnp.asarray(
        rng.rand(n_steps, spec.in_ch * B, spec.hw).astype(np.float32))
    y = jnp.asarray(
        rng.randint(0, spec.n_out, (n_steps, B, 1)).astype(np.int32))
    bits = epoch_noise_bits(
        jax.random.key(7, impl="rbg"), spec, n_batches, n_tiles)
    extra = {}
    if getattr(spec, "has_aux", False):
        extra["aux_steps"] = jnp.asarray(
            rng.rand(n_batches, B, 4).astype(np.float32))
    outs = {}
    for interp in (False, True):
        f = make_fn(spec, n_batches, interpret=interp)
        p2, m2, cm = f(kp, km, x, y, bits, 0.1, channel_major=True, **extra)
        outs[interp] = (np.asarray(cm),
                        [np.asarray(t) for t in p2])
    cm_hw, p_hw = outs[False]
    cm_it, p_it = outs[True]
    assert np.isfinite(cm_hw).all()
    np.testing.assert_allclose(cm_hw[:, 0], cm_it[:, 0], rtol=atol,
                               atol=atol)
    for a, b in zip(p_hw, p_it):
        np.testing.assert_allclose(a, b, rtol=atol, atol=atol)


def test_megastep_conv_hardware_matches_interpret():
    from theanet_tpu.ops import megastep as M
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = M.MegaSpec(
        batch=8, img=12, filt1=3, filt2=3, maps1=2, maps2=3, n_hid=16,
        n_out=4,
        slope1=0.1, slope2=0.05, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        reg1=reg, reg2=reg, reg_h=reg, reg_o=reg,
    )
    kshapes = [(2, 9), (2, 1), (3, 18), (3, 1),
               (spec.n_flat, 16), (1, 16), (16, 4), (1, 4)]
    _mega_consistency(M.make_epoch_fn, spec, kshapes)


def test_megastep_pool_variants_hardware_matches_interpret():
    """Non-default pooling (pool 3, ignore_border) through the Mosaic
    compiler vs interpret mode — guards the generalized roll-max/anchor
    constants against layout/wraparound miscompiles."""
    from theanet_tpu.ops import megastep as M
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = M.MegaSpec(
        batch=8, img=18, filt1=3, filt2=3, maps1=2, maps2=3, n_hid=16,
        n_out=4, pool1=3, pool2=2, ib1=False, ib2=True,
        slope1=0.1, slope2=0.05, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        reg1=reg, reg2=reg, reg_h=reg, reg_o=reg,
    )
    kshapes = [(2, 9), (2, 1), (3, 18), (3, 1),
               (spec.n_flat, 16), (1, 16), (16, 4), (1, 4)]
    _mega_consistency(M.make_epoch_fn, spec, kshapes)


def test_megastep_deep_hardware_matches_interpret():
    """The 3-conv deep family (ops/megastep_deep.py) through Mosaic vs
    interpret, full augmentation + dropout noise from the same bits."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, img=18, filts=(3, 3, 2), pools=(2, 2, 2),
        ibs=(False, False, False), maps=(1, 2, 2), slopes=(0.1, 0.05, 0.1),
        n_hid=16, n_out=4, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        regs=(reg, reg, reg), reg_h=reg, reg_o=reg,
    )
    kshapes = [(1, 9), (1, 1), (2, 9 * 1), (2, 1), (2, 4 * 2), (2, 1),
               (spec.n_flat, 16), (1, 16), (16, 4), (1, 4)]
    _mega_consistency(MD.make_deep_epoch_fn, spec, kshapes)


def test_megastep_smooth_acts_hardware_matches_interpret():
    """In-kernel smooth activations (tanh / sigmoid / softplus forward and
    their hand-derived backward — transcendental VPU ops) through Mosaic
    vs interpret mode in the flagship kernel."""
    from theanet_tpu.ops import megastep as M
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = M.MegaSpec(
        batch=8, img=12, filt1=3, filt2=3, maps1=2, maps2=3, n_hid=16,
        n_out=4,
        slope1=0.0, slope2=0.0, slope_h=0.0, pdrop=0.5,
        act1="tanh", act2="sigmoid", act_h="softplus",
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        reg1=reg, reg2=reg, reg_h=reg, reg_o=reg,
    )
    kshapes = [(2, 9), (2, 1), (3, 18), (3, 1),
               (spec.n_flat, 16), (1, 16), (16, 4), (1, 4)]
    _mega_consistency(M.make_epoch_fn, spec, kshapes)


def test_megastep_deep_scaled_tanh_hardware_matches_interpret():
    """Deep-family smooth activations (scaled_tanh levels + tanh hidden)
    through Mosaic vs interpret mode."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, img=18, filts=(3, 3, 2), pools=(2, 2, 2),
        ibs=(False, False, False), maps=(1, 2, 2),
        slopes=(0.0, 0.0, 0.0), acts=("scaled_tanh", "tanh", "sigmoid"),
        n_hid=16, n_out=4, slope_h=0.0, act_h="scaled_tanh", pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        regs=(reg, reg, reg), reg_h=reg, reg_o=reg,
    )
    kshapes = [(1, 9), (1, 1), (2, 9 * 1), (2, 1), (2, 4 * 2), (2, 1),
               (spec.n_flat, 16), (1, 16), (16, 4), (1, 4)]
    _mega_consistency(MD.make_deep_epoch_fn, spec, kshapes)


@pytest.mark.parametrize("loss,log_t", [("hinge", 0.0), ("exp", 0.0),
                                        ("nllsq", 0.0),
                                        ("nllT", -0.6931471805599453)])
def test_megastep_loss_variants_hardware_matches_interpret(loss, log_t):
    """The non-nll fused tail losses (hinge / exp / nllsq / truncated
    nll50 — gates, row-centering, squared-ll backward) through Mosaic vs
    interpret mode in the deep family."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, img=12, filts=(3,), pools=(2,), ibs=(False,),
        maps=(2,), slopes=(0.1,),
        n_hid=16, n_out=4, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        regs=(reg,), reg_h=reg, reg_o=reg,
        head="softmax", n_classes=4, loss=loss, log_thresh=log_t,
    )
    kshapes = [(2, 9), (2, 1), (spec.n_flat, 16), (1, 16), (16, 4), (1, 4)]
    _mega_consistency(MD.make_deep_epoch_fn, spec, kshapes)


def test_megastep_hidden_stack_hardware_matches_interpret():
    """A 2-layer pre-hidden stack (own dropout lane slices, chained
    backward) through Mosaic vs interpret mode."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, img=12, filts=(3,), pools=(2,), ibs=(False,),
        maps=(2,), slopes=(0.1,),
        n_hid=12, n_out=4, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        regs=(reg,), reg_h=reg, reg_o=reg,
        pre_hidden=((24, "tanh", 0.0, 0.3), (16, "leaky", 0.05, 0.0)),
        regs_pre=(reg, reg),
    )
    kshapes = [(2, 9), (2, 1),
               (spec.n_flat, 24), (1, 24), (24, 16), (1, 16),
               (16, 12), (1, 12), (12, 4), (1, 4)]
    _mega_consistency(MD.make_deep_epoch_fn, spec, kshapes)


def test_megastep_poolless_level_hardware_matches_interpret():
    """A pool-1 (identity) level — the kernel form of a Conv layer with
    no PoolLayer after it — through Mosaic vs interpret: zero-roll pool
    max, every-position anchor grid/compaction, and its backward gates."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, img=14, filts=(3, 3), pools=(1, 2), ibs=(False, False),
        maps=(2, 2), slopes=(0.1, 0.05),
        n_hid=16, n_out=4, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        regs=(reg, reg), reg_h=reg, reg_o=reg,
    )
    kshapes = [(2, 9), (2, 1), (2, 9 * 2), (2, 1),
               (spec.n_flat, 16), (1, 16), (16, 4), (1, 4)]
    _mega_consistency(MD.make_deep_epoch_fn, spec, kshapes)


def test_megastep_deep_color_hardware_matches_interpret():
    """Deep family with the in-kernel ColorLayer active (widened
    field-bits block, pow/exp/log math) through Mosaic vs interpret."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, img=12, filts=(3,), pools=(2,), ibs=(False,),
        maps=(2,), slopes=(0.1,),
        n_hid=16, n_out=4, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=False, nearest=True,
        regs=(reg,), reg_h=reg, reg_o=reg, in_ch=3,
        color=True, balance=1.2, gamma=1.3, maxval=1.0,
    )
    kshapes = [(2, 9 * 3), (2, 1), (spec.n_flat, 16), (1, 16), (16, 4),
               (1, 4)]
    _mega_consistency(MD.make_deep_epoch_fn, spec, kshapes)


def test_megastep_softaux_hardware_matches_interpret():
    """SoftAux head (aux step input + LocationInfo encoder + cross logits)
    through Mosaic vs interpret on the same bits."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, img=12, filts=(3,), pools=(2,), ibs=(False,),
        maps=(2,), slopes=(0.1,),
        n_hid=4, n_out=4, slope_h=1.0, pdrop=0.0,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        regs=(reg,), reg_h=reg, reg_o=reg,
        head="softaux", n_classes=4, n_aux=(5, 9), boost=1.0,
    )
    kshapes = [(2, 9), (2, 1), (spec.n_flat, 4), (1, 4),
               (2, 5), (1, 5), (5, 9), (1, 9), (9, 4), (1, 4)]
    _mega_consistency(MD.make_deep_epoch_fn, spec, kshapes)


def test_megastep_auxconcat_hardware_matches_interpret():
    """AuxConcat frozen-encoder tail (constants-only encoder, in-kernel
    lane concat of [flatten || encoder out], lane-0 mix draw, df
    truncation) through Mosaic vs interpret on the same bits."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg

    rng = np.random.RandomState(11)
    nah, nao = 5, 9
    aux_wts = b"".join(
        np.ascontiguousarray(a, np.float32).tobytes()
        for a in (rng.randn(2, nah) * 0.5, rng.randn(nah),
                  rng.randn(nah, nao) * 0.5, rng.randn(nao))
    )
    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, img=12, filts=(3,), pools=(2,), ibs=(False,),
        maps=(2,), slopes=(0.1,),
        n_hid=12, n_out=4, slope_h=0.01, pdrop=0.4,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        regs=(reg,), reg_h=reg, reg_o=reg,
        aux_concat=(nah, nao), aux_wts_bytes=aux_wts, boost=1.5,
    )
    kshapes = [(2, 9), (2, 1), (spec.n_tail_in, 12), (1, 12),
               (12, 4), (1, 4)]
    _mega_consistency(MD.make_deep_epoch_fn, spec, kshapes)


def test_megastep_mlp_hardware_matches_interpret():
    from theanet_tpu.ops import megastep_mlp as MM
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=1e-4, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.8)
    spec = MM.MlpSpec(
        batch=8, img=12, n_hid=24, n_out=5, slope_h=0.1, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True, reg_h=reg, reg_o=reg,
        in_ch=3,
    )
    kshapes = [(spec.n_flat, 24), (1, 24), (24, 5), (1, 5)]
    _mega_consistency(MM.make_mlp_epoch_fn, spec, kshapes)


def test_megastep_tiled_hardware_matches_interpret():
    """Batch tiling (n_tiles > 1): grad accumulation in VMEM scratch and
    the per-reference-batch update through Mosaic vs interpret."""
    from theanet_tpu.ops import megastep as M
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = M.MegaSpec(
        batch=8, img=12, filt1=3, filt2=3, maps1=2, maps2=3, n_hid=16,
        n_out=4,
        slope1=0.1, slope2=0.05, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        reg1=reg, reg2=reg, reg_h=reg, reg_o=reg,
        n_tiles=3, loss_div=24,
    )
    kshapes = [(2, 9), (2, 1), (3, 18), (3, 1),
               (spec.n_flat, 16), (1, 16), (16, 4), (1, 4)]
    _mega_consistency(M.make_epoch_fn, spec, kshapes, n_batches=4)


def test_megastep_dp_grad_kernel_hardware_matches_interpret():
    """The fused-DP per-step gradient kernel (ops/megastep_dp.py) through
    Mosaic vs interpret: same bits, same params -> same grads/cost/minf."""
    from theanet_tpu.ops import megastep_dp as DP
    from theanet_tpu.ops.megastep import LayerReg, MegaSpec

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MegaSpec(
        batch=8, img=12, filt1=3, filt2=3, maps1=2, maps2=3, n_hid=16,
        n_out=4,
        slope1=0.1, slope2=0.05, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        reg1=reg, reg2=reg, reg_h=reg, reg_o=reg,
    )
    kshapes = [(2, 9), (2, 1), (3, 18), (3, 1),
               (spec.n_flat, 16), (1, 16), (16, 4), (1, 4)]
    rng = np.random.RandomState(3)
    kp = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
          for s in kshapes]
    x = jnp.asarray(rng.rand(1, spec.in_ch * spec.batch, spec.hw)
                    .astype(np.float32))
    y = jnp.asarray(rng.randint(0, 4, (1, spec.batch, 1)).astype(np.int32))
    ub = jax.random.bits(jax.random.key(5, impl="rbg"), (1, 1, 8),
                         jnp.uint32)
    fb = jax.random.bits(jax.random.key(6, impl="rbg"), (1, spec.hw, 4),
                         jnp.uint32).transpose(0, 2, 1)
    pb = jax.random.bits(jax.random.key(7, impl="rbg"),
                         (1, spec.batch, spec.hw), jnp.uint32)
    db = jax.random.bits(jax.random.key(8, impl="rbg"),
                         (1, spec.batch, spec.n_hid), jnp.uint32)
    outs = {}
    for interp in (False, True):
        step = DP.make_dp_step_fn(spec, interpret=interp)
        grads, cost, minf = jax.jit(step)(x, y, ub, fb, pb, db, kp)
        outs[interp] = ([np.asarray(g) for g in grads], float(cost),
                        float(minf))
    g_hw, c_hw, m_hw = outs[False]
    g_it, c_it, m_it = outs[True]
    assert np.isfinite(c_hw)
    np.testing.assert_allclose(c_hw, c_it, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(m_hw, m_it, rtol=2e-2, atol=2e-2)
    for a, b in zip(g_hw, g_it):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


def _deep_dp_spec(head="softmax"):
    from theanet_tpu.ops.megastep import LayerReg
    from theanet_tpu.ops.megastep_deep import DeepSpec

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    kw = dict(
        batch=8, img=12, filts=(3,), pools=(2,), ibs=(True,), maps=(8,),
        slopes=(0.1,), n_hid=16, n_out=4, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=False,
        regs=(reg,), reg_h=reg, reg_o=reg,
    )
    if head == "softaux":
        kw.update(head="softaux", n_hid=4, n_classes=4, n_aux=(8, 16),
                  boost=1.5)
    elif head == "rbf":
        kw.update(head="rbf", n_out=12, n_classes=4, junk_dist=50.0,
                  learn_centers=True)
    return DeepSpec(**kw)


@pytest.mark.parametrize("head", ["softmax", "rbf", "softaux"])
def test_megastep_deep_dp_grad_kernel_hardware_matches_interpret(head):
    """The deep-family fused-DP gradient kernel (every head) through Mosaic
    vs interpret: same bits, same params -> same grads/cost/minf."""
    from theanet_tpu.ops import megastep_dp as DP
    from theanet_tpu.ops.megastep_deep import deep_kernel_shapes

    spec = _deep_dp_spec(head)
    kshapes = deep_kernel_shapes(spec)
    rng = np.random.RandomState(3)
    kp = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
          for s in kshapes]
    x = jnp.asarray(rng.rand(1, spec.in_ch * spec.batch, spec.hw)
                    .astype(np.float32))
    y = jnp.asarray(rng.randint(0, spec.n_classes or spec.n_out,
                                (1, spec.batch, 1)).astype(np.int32))
    ub = jax.random.bits(jax.random.key(5, impl="rbg"), (1, 1, 8),
                         jnp.uint32)
    fb = jax.random.bits(jax.random.key(6, impl="rbg"), (1, spec.hw, 4),
                         jnp.uint32).transpose(0, 2, 1)
    pb = jax.random.bits(jax.random.key(7, impl="rbg"),
                         (1, spec.batch, spec.hw), jnp.uint32)
    db = jax.random.bits(jax.random.key(8, impl="rbg"),
                         (1, spec.batch, spec.n_hid), jnp.uint32)
    aux = (jnp.asarray(rng.rand(1, spec.batch, 4).astype(np.float32))
           if spec.has_aux else None)
    outs = {}
    for interp in (False, True):
        step = DP.make_dp_step_fn(spec, interpret=interp)
        grads, cost, minf = jax.jit(step)(x, y, ub, fb, pb, db, kp, aux=aux)
        outs[interp] = ([np.asarray(g) for g in grads], float(cost),
                        float(minf))
    g_hw, c_hw, m_hw = outs[False]
    g_it, c_it, m_it = outs[True]
    assert np.isfinite(c_hw)
    np.testing.assert_allclose(c_hw, c_it, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(m_hw, m_it, rtol=2e-2, atol=2e-2)
    for a, b in zip(g_hw, g_it):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


def test_megastep_flat_net_hardware_matches_interpret():
    """A zero-conv-level (flat dense) deep spec — multi-hidden tail,
    full augmentation, dropout — through Mosaic vs interpret mode."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, img=12, filts=(), pools=(), ibs=(), maps=(), slopes=(),
        n_hid=12, n_out=4, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        regs=(), reg_h=reg, reg_o=reg,
        pre_hidden=((16, "tanh", 0.0, 0.3),),
        regs_pre=(reg,),
    )
    kshapes = [(spec.n_flat, 16), (1, 16),
               (16, 12), (1, 12), (12, 4), (1, 4)]
    _mega_consistency(MD.make_deep_epoch_fn, spec, kshapes)


GEOMETRY_CASES = [
    # 'same' stack: signed tap offsets + 2-D-clipped read masks, level-2
    # ceil-pool partial windows (5 -> 3) engage the pool edge guards
    ("same-stack", dict(img=10, filts=(3, 3), pools=(2, 2),
                        ibs=(False, False), maps=(3, 4),
                        slopes=(0.07, 0.07), modes=("same", "same"),
                        conv_strides=(1, 1))),
    # strided conv in the reference-consistent envelope (2 | 14-3+1):
    # full-grid conv + cstride-spaced anchor/member/valid compaction
    ("stride2", dict(img=14, filts=(3,), pools=(2,), ibs=(False,),
                     maps=(3,), slopes=(0.07,), modes=("valid",),
                     conv_strides=(2,))),
    # pool window wider than the filter AND the conv slack: anchor reads
    # cross rows unless the _pool_max guards clip them
    ("pool-gt-filter", dict(img=13, filts=(3,), pools=(5,), ibs=(False,),
                            maps=(3,), slopes=(0.07,), modes=("valid",),
                            conv_strides=(1,))),
    # mixed: a 'same' level feeding a strided 'valid' level
    ("same-then-stride", dict(img=12, filts=(3, 3), pools=(2, 2),
                              ibs=(False, False), maps=(2, 3),
                              slopes=(0.07, 0.07),
                              modes=("same", "valid"),
                              conv_strides=(1, 2))),
    # mode='full' stack (r5): entry embedding onto the padded working
    # grid, composed compaction embeddings between levels, wash-eligible
    # pools (ceil(13/3)=ceil(15/3)=5, ceil(6/4)=ceil(8/4)=2)
    ("full-stack", dict(img=11, filts=(3, 2), pools=(3, 4),
                        ibs=(False, False), maps=(2, 3),
                        slopes=(0.07, 0.07), modes=("full", "full"),
                        conv_strides=(1, 1))),
]


@pytest.mark.parametrize("name,kw", GEOMETRY_CASES,
                         ids=[c[0] for c in GEOMETRY_CASES])
def test_megastep_geometry_hardware_matches_interpret(name, kw):
    """The r4 conv-geometry extensions (mode='same' masked stores, strided
    anchor lattices, pool-max edge guards — tests/test_fused_modes.py has
    the CPU trajectory pins) through the REAL Mosaic compiler vs interpret
    mode: the clipped tap masks and guarded rolls are exactly the kind of
    layout/masking code interpret mode cannot vouch for."""
    from theanet_tpu.ops import megastep_deep as MD
    from theanet_tpu.ops.megastep import LayerReg
    from theanet_tpu.ops.megastep_deep import deep_kernel_shapes

    reg = LayerReg(L1=0.0, L2=1e-3, momentum=0.95, rate=1.0, maxnorm=0.0)
    spec = MD.DeepSpec(
        batch=8, n_hid=16, n_out=4, slope_h=0.01, pdrop=0.5,
        translation=2, zoom=1.05, magnitude=6, sigma=3, pflip=0.02,
        angle=3, invert=True, nearest=True,
        regs=(reg,) * len(kw["filts"]), reg_h=reg, reg_o=reg,
        **kw,
    )
    _mega_consistency(MD.make_deep_epoch_fn, spec, deep_kernel_shapes(spec))
