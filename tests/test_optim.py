"""adam_lowmem oracle tests: optax.adam is the reference implementation."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from opensetgaitrecognition_pcaa_tpu.train.optim import adam_lowmem


def _params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32) * 0.05),
        "b": jnp.asarray(rng.normal(size=(32,)).astype(np.float32)),
    }


def _run(tx, params, n_steps=7, seed=1):
    rng = np.random.default_rng(seed)
    state = tx.init(params)
    for _ in range(n_steps):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32) * 0.1
            ),
            params,
        )
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params


class TestAdamLowmem:
    def test_f32_matches_optax_adam_exactly(self):
        p0 = _params()
        got = _run(adam_lowmem(1e-3, b1=0.9, b2=0.99), dict(p0))
        want = _run(optax.adam(1e-3, b1=0.9, b2=0.99), dict(p0))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            got,
            want,
        )

    def test_bf16_mu_tracks_optax_mu_dtype(self):
        """bf16-mu path vs optax's: the EMA/cast op ordering differs by one
        bf16 rounding per step (~0.4% of the update), so trajectories track
        within a few e-5 over 7 × 1e-3-sized steps — not bitwise."""
        p0 = _params()
        got = _run(adam_lowmem(1e-3, b1=0.9, b2=0.99, mu_dtype=jnp.bfloat16), dict(p0))
        want = _run(
            optax.adam(1e-3, b1=0.9, b2=0.99, mu_dtype=jnp.bfloat16), dict(p0)
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-4
            ),
            got,
            want,
        )

    def test_bf16_nu_close_to_f32(self):
        p0 = _params()
        narrow = _run(
            adam_lowmem(
                1e-3, b1=0.9, b2=0.99,
                mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16,
            ),
            dict(p0),
            n_steps=20,
        )
        full = _run(optax.adam(1e-3, b1=0.9, b2=0.99), dict(p0), n_steps=20)
        # bf16 nu storage perturbs updates by ≲0.4%/sqrt → params stay
        # within a fraction of the total 20-step displacement
        for k in p0:
            disp = np.abs(np.asarray(full[k]) - np.asarray(p0[k])).max()
            err = np.abs(np.asarray(narrow[k]) - np.asarray(full[k])).max()
            assert err < 0.05 * disp, (k, err, disp)

    def test_state_is_narrow(self):
        tx = adam_lowmem(
            1e-3, mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16
        )
        state = tx.init(_params())
        inner = state[0] if isinstance(state, tuple) else state
        leaf_mu = jax.tree_util.tree_leaves(inner.mu)[0]
        leaf_nu = jax.tree_util.tree_leaves(inner.nu)[0]
        assert leaf_mu.dtype == jnp.bfloat16
        assert leaf_nu.dtype == jnp.bfloat16


class TestFusedAdamTreeUpdate:
    """ops/pallas/adam_kernel.py vs the optax oracle (same trajectory)."""

    def _run_fused(self, params, n_steps=7, seed=1, **kw):
        from opensetgaitrecognition_pcaa_tpu.ops.pallas.adam_kernel import (
            fused_adam_tree_update,
        )

        rng = np.random.default_rng(seed)
        count = jnp.zeros([], jnp.int32)
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        for _ in range(n_steps):
            grads = jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape).astype(np.float32) * 0.1
                ),
                params,
            )
            params, count, mu, nu = fused_adam_tree_update(
                grads, count, mu, nu, params,
                lr=1e-3, b1=0.9, b2=0.99, **kw,
            )
        return params

    def test_xla_path_matches_optax(self):
        p0 = _params()
        got = self._run_fused(dict(p0), use_pallas=False)
        want = _run(optax.adam(1e-3, b1=0.9, b2=0.99), dict(p0))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            got,
            want,
        )

    def test_pallas_path_matches_optax_interpret(self):
        """Kernel path (interpret mode) incl. non-(8,128)-divisible edge
        blocks: 136×648 → partial blocks on both grid axes."""
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.default_rng(3)
        p0 = {"big": jnp.asarray(rng.normal(size=(136, 648)).astype(np.float32))}
        with pltpu.force_tpu_interpret_mode():
            got = self._run_fused(
                dict(p0), n_steps=3, use_pallas=True, min_kernel_elems=0
            )
        want = _run(optax.adam(1e-3, b1=0.9, b2=0.99), dict(p0), n_steps=3)
        np.testing.assert_allclose(
            np.asarray(got["big"]), np.asarray(want["big"]), rtol=1e-5, atol=1e-6
        )

    def test_preserves_moment_dtypes(self):
        from opensetgaitrecognition_pcaa_tpu.ops.pallas.adam_kernel import (
            fused_adam_tree_update,
        )

        p = _params()
        mu = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x, dtype=jnp.bfloat16), p
        )
        nu = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x, dtype=jnp.bfloat16), p
        )
        g = jax.tree_util.tree_map(jnp.ones_like, p)
        p2, c2, mu2, nu2 = fused_adam_tree_update(
            g, jnp.zeros([], jnp.int32), mu, nu, p,
            lr=1e-3, b1=0.9, b2=0.99, use_pallas=False,
        )
        assert jax.tree_util.tree_leaves(mu2)[0].dtype == jnp.bfloat16
        assert jax.tree_util.tree_leaves(nu2)[0].dtype == jnp.bfloat16
        assert jax.tree_util.tree_leaves(p2)[0].dtype == jnp.float32
        assert int(c2) == 1


class TestAdamFactored:
    def test_small_leaves_match_optax(self):
        """Leaves below the factoring threshold are exact Adam."""
        from opensetgaitrecognition_pcaa_tpu.train.optim import adam_factored

        p0 = _params()
        got = _run(adam_factored(1e-3, b1=0.9, b2=0.99), dict(p0))
        want = _run(optax.adam(1e-3, b1=0.9, b2=0.99), dict(p0))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            got,
            want,
        )

    def test_rank1_gradient_is_exact(self):
        """On a factored leaf, a rank-1 |g| makes the factorization exact:
        R_i·C_j/ΣR == (g²)_ij, so one step reproduces optax.adam."""
        from opensetgaitrecognition_pcaa_tpu.train.optim import adam_factored

        rng = np.random.default_rng(5)
        a = rng.normal(size=(24, 1)).astype(np.float32)
        b = rng.normal(size=(1, 40)).astype(np.float32)
        g = {"w": jnp.asarray(a @ b)}
        p = {"w": jnp.zeros((24, 40), jnp.float32)}

        tx = adam_factored(1e-3, b1=0.9, b2=0.99, min_elems=1)
        s = tx.init(p)
        u, _ = tx.update(g, s, p)

        txo = optax.adam(1e-3, b1=0.9, b2=0.99)
        so = txo.init(p)
        uo, _ = txo.update(g, so, p)
        np.testing.assert_allclose(
            np.asarray(u["w"]), np.asarray(uo["w"]), rtol=1e-4, atol=1e-6
        )

    def test_factored_state_is_tiny(self):
        from opensetgaitrecognition_pcaa_tpu.train.optim import adam_factored

        p = {"w": jnp.zeros((64, 128), jnp.float32)}
        tx = adam_factored(1e-3, min_elems=1)
        s = tx.init(p)
        nu = s[0].nu["w"]
        assert set(nu) == {"r", "c"}
        assert nu["r"].shape == (64,) and nu["c"].shape == (128,)

    def test_tracks_full_adam_on_generic_gradients(self):
        """Generic RANDOM gradients are the worst case for the rank-1
        factorization (real NN gradient second moments carry strong
        row/col structure — Shazeer & Stern §4). This is a sanity bound:
        same order of magnitude as exact Adam, finite, no blowup. The
        decisive quality check is the multi-seed training gate on the
        synthetic set (tools/gate_optimizer_quality.py)."""
        from opensetgaitrecognition_pcaa_tpu.train.optim import adam_factored

        rng0 = np.random.default_rng(7)
        p0 = {"w": jnp.asarray(rng0.normal(size=(32, 48)).astype(np.float32) * 0.05)}
        fac = _run(
            adam_factored(1e-3, b1=0.9, b2=0.99, min_elems=1), dict(p0), n_steps=20
        )
        full = _run(optax.adam(1e-3, b1=0.9, b2=0.99), dict(p0), n_steps=20)
        disp = np.abs(np.asarray(full["w"]) - np.asarray(p0["w"])).max()
        err = np.abs(np.asarray(fac["w"]) - np.asarray(full["w"])).max()
        assert np.isfinite(np.asarray(fac["w"])).all()
        assert err < 0.5 * disp, (err, disp)


class TestBF16WeightCache:
    """Config.BF16_WEIGHT_CACHE must be numerically INVISIBLE: under bf16
    compute the flag only changes where the decoder-kernel cast happens
    (carried copy vs cast-at-read), so flag-on and flag-off training must be
    bit-identical (train/pcaa.py::_cache_leaf; biases stay f32 because
    TorchDense adds them to the f32 accumulator pre-downcast)."""

    def _pcaa(self, flag, n_steps=3):
        from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
        from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
            VARIANTS,
            build_pcaa,
            make_train_step,
        )

        cfg = Config(
            NMAX=16, NSTEPS=8, CROP_STEP=4, POINTNET_OUT_DIM=32,
            DTC_FILTERS=(8, 8, 8, 8, 8, 16), SUP_LATENT_DIM=16,
            TRAIN_CLASSES=(0, 1, 2), BATCH_SIZE=8, MODEL_NAME="wc",
            COMPUTE_DTYPE="bfloat16", BF16_WEIGHT_CACHE=flag,
        )
        mods, st = build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(mods, cfg))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 8, 16, 4)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 3, 8, dtype=np.int32))
        for i in range(n_steps):
            st, _ = step(st, x, y, jnp.int32(i))
        return jax.device_get(st.params_g)

    def _orced(self, flag, n_steps=3):
        from opensetgaitrecognition_pcaa_tpu.config import Config
        from opensetgaitrecognition_pcaa_tpu.train.orced import (
            build_orced,
            make_orced_train_step,
        )

        cfg = Config(
            NMAX=16, NSTEPS=8, CROP_STEP=4, POINTNET_OUT_DIM=32,
            DTC_FILTERS=(8, 8, 8, 8, 8, 16), SUP_LATENT_DIM=16,
            TRAIN_CLASSES=(0, 1, 2), BATCH_SIZE=8, MODEL_NAME="owc",
            COMPUTE_DTYPE="bfloat16", BF16_WEIGHT_CACHE=flag,
        )
        models, st = build_orced(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_orced_train_step(models, cfg))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 8, 16, 4)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 3, 8, dtype=np.int32))
        for i in range(n_steps):
            st, _ = step(st, x, y, jnp.int32(i), jnp.float32(0.5))
        return jax.device_get(st.params)

    def test_pcaa_bit_identical(self):
        p_off = self._pcaa(False)
        p_on = self._pcaa(True)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), p_off, p_on
        )

    def test_orced_bit_identical(self):
        p_off = self._orced(False)
        p_on = self._orced(True)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), p_off, p_on
        )

    def test_requires_bf16_compute(self):
        import pytest

        from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
        from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
            VARIANTS,
            build_pcaa,
        )

        cfg = Config(
            NMAX=16, NSTEPS=8, CROP_STEP=4, POINTNET_OUT_DIM=32,
            DTC_FILTERS=(8, 8, 8, 8, 8, 16), SUP_LATENT_DIM=16,
            TRAIN_CLASSES=(0, 1, 2), BATCH_SIZE=8, MODEL_NAME="wc",
            BF16_WEIGHT_CACHE=True,  # COMPUTE_DTYPE left at f32 default
        )
        with pytest.raises(AssertionError, match="bf16"):
            build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(0))
