"""DEFERRED_DECODER_UPDATE: the pipelined Adam schedule is the same math.

The deferred schedule moves the decoder's parameter write from the end of
body k to the start of body k+1 (plus a post-scan flush). Under f32
moments the write is recomputed from exactly the values the undeferred
schedule used, so the entire training trajectory — params, moments,
BatchNorm stats, metrics — must match the baseline BIT-FOR-BIT. This
test guards that invariant; throughput is measured separately on TPU
(tools/profile_deferred.py, PERF_ROOFLINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensetgaitrecognition_pcaa_tpu.config import VARIATION
from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
    VARIANTS,
    build_pcaa,
    make_epoch_fns,
)

from tests.test_train import tiny_config


def _run_epochs(cfg, arrays, n_epochs=2):
    x_t, y_t, x_v, y_v = arrays
    x_t, y_t = jnp.asarray(x_t), jnp.asarray(y_t)
    spec = VARIANTS[VARIATION.V4]
    mods, state = build_pcaa(cfg, spec, jax.random.PRNGKey(cfg.SEED))
    train_epoch, _ = make_epoch_fns(mods, cfg)

    host_rng = np.random.default_rng(cfg.SEED)
    n = x_t.shape[0]
    steps = n // cfg.BATCH_SIZE
    all_metrics = []
    for _ in range(n_epochs):
        order = host_rng.permutation(n)
        perm = jnp.asarray(
            order[: steps * cfg.BATCH_SIZE]
            .reshape(steps, cfg.BATCH_SIZE)
            .astype(np.int32)
        )
        state, m = train_epoch(state, x_t, y_t, perm)
        all_metrics.append(jax.device_get(m))
    return jax.device_get(state), all_metrics


def _assert_trees_equal(a, b, what, exact=True):
    leaves_a, td_a = jax.tree_util.tree_flatten(a)
    leaves_b, td_b = jax.tree_util.tree_flatten(b)
    assert td_a == td_b, what
    for i, (la, lb) in enumerate(zip(leaves_a, leaves_b)):
        la = np.asarray(la)
        lb = np.asarray(lb)
        if exact:
            assert np.array_equal(la, lb), (what, i, np.max(np.abs(la - lb)))
        else:
            np.testing.assert_allclose(
                np.asarray(la, np.float64),
                np.asarray(lb, np.float64),
                rtol=1e-6,
                atol=1e-7,
                err_msg=f"{what} leaf {i}",
            )


def test_deferred_schedule_is_bitexact_f32(generated_splits, tmp_path):
    from opensetgaitrecognition_pcaa_tpu.config import SPLIT
    from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset

    gen, _ = generated_splits
    x_t, y_t = RadarCropDataset(SPLIT.TRAIN, gen).load_all()
    arrays = (x_t, y_t, None, None)

    cfg_off = tiny_config(gen, tmp_path, "DEF_OFF", EPOCHS=2)
    cfg_on = tiny_config(
        gen, tmp_path, "DEF_ON", EPOCHS=2, DEFERRED_DECODER_UPDATE=True
    )

    st_off, m_off = _run_epochs(cfg_off, arrays)
    st_on, m_on = _run_epochs(cfg_on, arrays)

    # Trajectory identity: params (incl. the flushed decoder), optimizer
    # moments and count, BN stats, and every per-step metric.
    _assert_trees_equal(st_off.params_g, st_on.params_g, "params_g")
    _assert_trees_equal(st_off.params_d, st_on.params_d, "params_d")
    _assert_trees_equal(st_off.batch_stats, st_on.batch_stats, "batch_stats")
    _assert_trees_equal(st_off.opt_g, st_on.opt_g, "opt_g")
    _assert_trees_equal(m_off, m_on, "metrics")


def test_deferred_with_bf16_stack_runs_and_stays_close(
    generated_splits, tmp_path
):
    """Bench-config composition (bf16 compute + bf16 moments + weight
    cache): the deferred write recomputes from the STORED (bf16-rounded)
    moments, so it is deliberately not bit-equal — assert it is finite and
    tracks the undeferred schedule within the moment-rounding scale."""
    from opensetgaitrecognition_pcaa_tpu.config import SPLIT
    from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset

    gen, _ = generated_splits
    x_t, y_t = RadarCropDataset(SPLIT.TRAIN, gen).load_all()
    arrays = (x_t, y_t, None, None)

    kw = dict(
        EPOCHS=1,
        COMPUTE_DTYPE="bfloat16",
        BF16_ADAM_NU=True,
        BF16_WEIGHT_CACHE=True,
    )
    cfg_off = tiny_config(gen, tmp_path, "DEFB_OFF", **kw)
    cfg_on = tiny_config(
        gen, tmp_path, "DEFB_ON", DEFERRED_DECODER_UPDATE=True, **kw
    )

    st_off, m_off = _run_epochs(cfg_off, arrays, n_epochs=1)
    st_on, m_on = _run_epochs(cfg_on, arrays, n_epochs=1)

    for leaf in jax.tree_util.tree_leaves(st_on.params_g):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
    # Training metrics agree to bf16-rounding order; count must be exact.
    off_c = np.asarray(st_off.opt_g[0].count)
    on_c = np.asarray(st_on.opt_g[0].count)
    assert np.array_equal(off_c, on_c)
    # n_correct is an integer count — a single boundary-prediction flip
    # moves it by 1, far beyond any float rtol; give it absolute slack and
    # hold the float losses to bf16-rounding-scale relative agreement.
    np.testing.assert_allclose(
        np.asarray(m_off[0]["n_correct"]),
        np.asarray(m_on[0]["n_correct"]),
        atol=2.0,
    )
    loss_keys = sorted(k for k in m_off[0] if k != "n_correct")
    np.testing.assert_allclose(
        np.concatenate([np.ravel(m_off[0][k]) for k in loss_keys]),
        np.concatenate([np.ravel(m_on[0][k]) for k in loss_keys]),
        rtol=0.05,
        atol=0.05,
    )


def test_deferred_grid_trainer_rejects_flag(generated_splits, tmp_path):
    from opensetgaitrecognition_pcaa_tpu.parallel.grid import GridPCAATrainer

    gen, _ = generated_splits
    cfg = tiny_config(
        gen, tmp_path, "DEF_GRID", DEFERRED_DECODER_UPDATE=True
    )
    x = np.zeros((8, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES), np.float32)
    y = np.zeros((8,), np.int32)
    with pytest.raises(AssertionError, match="solo-trainer"):
        GridPCAATrainer([cfg], VARIATION.V4, [(x, y)])
