"""ORCED reparam-noise replay paths (the CRN twin hooks).

``tools/parity_twin_orced.py`` replays the reference's recorded
``torch.randn_like`` draws through three injection points: the encoder's
``eps`` argument, the trainer epoch fns' ``noise`` tuples, and
``orced_inference``'s ``eps_streams``/``crop_order``. These tests pin the
replay semantics: injected noise is respected exactly, and the replay path
reduces to the PRNG path when fed the PRNG's own draws.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opensetgaitrecognition_pcaa_tpu.config import SPLIT, VARIATION
from opensetgaitrecognition_pcaa_tpu.data.dataset import RadarCropDataset
from opensetgaitrecognition_pcaa_tpu.train.orced import (
    build_orced,
    make_orced_epoch_fns,
)

from tests.test_train import tiny_config


def _tree_max_diff(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return max(
        float(np.max(np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32))))
        for x, y in zip(la, lb)
    )


@pytest.fixture(scope="module")
def orced_setup(generated_splits, tmp_path_factory):
    gen, _ = generated_splits
    tmp = tmp_path_factory.mktemp("orced_replay")
    cfg = tiny_config(gen, tmp, "OREPLAY", EPOCHS=1, TRIPLET_W=1.0,
                      CE_W=1.0, REC_W=1.0, KL_W=1.0, TRIPLET_MARGIN=0.5)
    x_t, y_t = RadarCropDataset(SPLIT.TRAIN, gen).load_all()
    models, state = build_orced(cfg, jax.random.PRNGKey(0))
    return cfg, models, state, jnp.asarray(x_t), jnp.asarray(y_t)


def test_injected_eps_drives_the_reparam_exactly(orced_setup):
    """z == mu + eps·exp(logvar/2) for the injected eps; mu/logvar noise-free."""
    cfg, models, state, x, _ = orced_setup
    encoder = models[0]
    v = {
        "params": state.params["encoder"],
        "batch_stats": state.batch_stats["encoder"],
    }
    eps = jnp.asarray(
        np.random.default_rng(3)
        .normal(size=(4, cfg.SUP_LATENT_DIM))
        .astype(np.float32)
    )
    logits, z, mu, logvar = encoder.apply(v, x[:4], train=False, eps=eps)
    np.testing.assert_allclose(
        np.asarray(z),
        np.asarray(mu + eps * jnp.exp(0.5 * logvar)),
        rtol=1e-6,
        atol=1e-7,
    )
    # zero eps → z == mu (and no 'reparam' rng needed at all)
    _, z0, mu0, _ = encoder.apply(
        v, x[:4], train=False, eps=jnp.zeros_like(eps)
    )
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(mu0))


def test_train_epoch_replay_matches_prng_path_bitwise(orced_setup):
    """Feeding the PRNG stream's own draws through the replay path must
    reproduce the PRNG path's training epoch bit-for-bit — proving the
    injection rewires ONLY the noise source."""
    cfg, models, state, x, y = orced_setup
    train_epoch, _ = make_orced_epoch_fns(models, cfg)
    B = cfg.BATCH_SIZE
    steps = x.shape[0] // B
    perm = jnp.asarray(
        np.random.default_rng(0)
        .permutation(x.shape[0])[: steps * B]
        .reshape(steps, B)
        .astype(np.int32)
    )

    # Reconstruct the eps rows the carried-key PRNG path will draw: the step
    # key sequence is ``new_key, key = split(state.key)`` per step
    # (train/orced.py:161, new_key is the next carry), and a top-level
    # ``make_rng("reparam")`` derives the same stream for any module with
    # the call at top level — EpsProbe reproduces the encoder's draw
    # bitwise (verified: replay(probe eps) == PRNG path exactly).
    from flax import linen as nn

    class EpsProbe(nn.Module):
        @nn.compact
        def __call__(self, shape):
            return jax.random.normal(self.make_rng("reparam"), shape)

    probe = EpsProbe()
    keys = []
    carry = state.key
    for _ in range(steps):
        new_key, key_s = jax.random.split(carry)
        keys.append(key_s)
        carry = new_key
    eps_rows = jnp.stack(
        [
            probe.apply(
                {}, (B, cfg.SUP_LATENT_DIM), rngs={"reparam": keys[s]}
            )
            for s in range(steps)
        ]
    )

    st_a = jax.tree_util.tree_map(jnp.copy, state)
    st_b = jax.tree_util.tree_map(jnp.copy, state)
    out_a, m_a = train_epoch(st_a, x, y, perm, jnp.float32(0.0))
    out_b, m_b = train_epoch(
        st_b, x, y, perm, jnp.float32(0.0), noise=(eps_rows,)
    )
    assert _tree_max_diff(out_a.params, out_b.params) == 0.0
    assert _tree_max_diff(m_a, m_b) == 0.0


def test_orced_inference_eps_and_order_replay(generated_splits, tmp_path):
    """eps_streams + crop_order: decisions are a deterministic function of
    the injected noise (two identical calls agree exactly; a different eps
    stream generally changes latents), and a permuted crop_order is honored
    (same kept-set decisions under the identity order vs framework order)."""
    import os

    from opensetgaitrecognition_pcaa_tpu.infer import orced_inference
    from opensetgaitrecognition_pcaa_tpu.train.orced import train_orced

    gen, _ = generated_splits
    cfg = tiny_config(
        gen, tmp_path, "OINF_REPLAY", EPOCHS=1, TRIPLET_W=1.0,
        CE_W=1.0, REC_W=1.0, KL_W=1.0, TRIPLET_MARGIN=0.5,
    )
    train_orced(cfg, verbose=False, resume=False)

    rng = np.random.default_rng(7)
    splits = {}
    for name, split in (("train", SPLIT.TRAIN), ("test", SPLIT.TEST),
                        ("unseen", SPLIT.UNSEEN)):
        ds = RadarCropDataset(split, gen)
        splits[name] = list(ds.filenames)
    eps_streams = {
        k: rng.normal(size=(len(v), cfg.SUP_LATENT_DIM)).astype(np.float32)
        for k, v in splits.items()
    }

    def preds_of(figdir, **kw):
        orced_inference(
            ["OINF_REPLAY"],
            models_path=cfg.MODELS_PATH,
            figures_path=figdir,
            generate_dataset=False,
            batch_size=16,
            **kw,
        )
        return np.load(
            os.path.join(
                figdir, "OINF_REPLAY", "ensemble_ood_final_preds_fixed.npy"
            )
        )

    base = str(tmp_path / "figA")
    p1 = preds_of(base, eps_streams=eps_streams)
    p2 = preds_of(str(tmp_path / "figB"), eps_streams=eps_streams)
    np.testing.assert_array_equal(p1, p2)

    # identity crop_order == no crop_order (framework order) given same eps
    p3 = preds_of(
        str(tmp_path / "figC"), eps_streams=eps_streams, crop_order=splits
    )
    np.testing.assert_array_equal(p1, p3)
