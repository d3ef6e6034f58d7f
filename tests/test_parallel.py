"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from opensetgaitrecognition_pcaa_tpu.config import Config, VARIATION
from opensetgaitrecognition_pcaa_tpu.parallel import (
    batch_sharding,
    create_mesh,
    state_shardings,
)
from opensetgaitrecognition_pcaa_tpu.train.pcaa import (
    VARIANTS,
    build_pcaa,
    make_train_step,
)


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def tiny_cfg(batch):
    return Config(
        NMAX=16,
        NSTEPS=8,
        POINTNET_OUT_DIM=64,
        DTC_FILTERS=(8, 8, 8, 8, 8, 16),
        SUP_LATENT_DIM=16,
        TRAIN_CLASSES=(0, 1, 2),
        BATCH_SIZE=batch,
        MODEL_NAME="par",
    )


class TestMesh:
    def test_create_mesh_shapes(self):
        mesh = create_mesh(8, model_parallel=2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        mesh = create_mesh(8)
        assert dict(mesh.shape) == {"data": 8, "model": 1}

    def test_tp_rule_shards_wide_kernels_only(self):
        mesh = create_mesh(8, model_parallel=2)
        state = {
            "wide": jnp.zeros((64, 256)),
            "narrow": jnp.zeros((8, 6)),
            "bias": jnp.zeros((256,)),
        }
        sh = state_shardings(state, mesh, min_dim=128)
        assert sh["wide"].spec == P(None, "model")
        assert sh["narrow"].spec == P()
        assert sh["bias"].spec == P()


class TestShardedTrainStep:
    def test_dp_tp_step_runs_and_matches_single_device(self):
        mesh = create_mesh(8, model_parallel=2)
        cfg = tiny_cfg(batch=8)
        mods, state = build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(0))
        train_step = make_train_step(mods, cfg)

        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.normal(size=(8, cfg.NSTEPS, cfg.NMAX, cfg.NFEATURES)).astype(
                np.float32
            )
        )
        y = jnp.asarray(rng.integers(0, 3, 8, dtype=np.int32))

        # single device reference
        s1, m1 = jax.jit(train_step)(state, x, y, jnp.int32(0))
        m1 = jax.device_get(m1)

        # sharded
        mods2, state2 = build_pcaa(cfg, VARIANTS[VARIATION.V4], jax.random.PRNGKey(0))
        st_sh = state_shardings(state2, mesh, min_dim=16)
        data_sh = batch_sharding(mesh)
        scalar_sh = NamedSharding(mesh, P())
        state2 = jax.tree_util.tree_map(jax.device_put, state2, st_sh)
        step = jax.jit(
            train_step,
            in_shardings=(st_sh, data_sh, data_sh, scalar_sh),
            out_shardings=(st_sh, None),
        )
        s2, m2 = step(
            state2,
            jax.device_put(x, data_sh),
            jax.device_put(y, data_sh),
            jax.device_put(jnp.int32(0), scalar_sh),
        )
        m2 = jax.device_get(m2)

        # same math on every mesh layout (fp tolerance for reduction order)
        for k in ("d_loss", "tot_loss", "rec_loss", "sup_loss"):
            np.testing.assert_allclose(m1[k], m2[k], rtol=2e-3, atol=2e-4)
        assert m1["n_correct"] == m2["n_correct"]


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        logits, fv = jax.device_get(out)
        assert logits.shape == (8, 8) and fv.shape == (8, 32)
        assert np.isfinite(logits).all()

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
