"""Pallas flash-attention kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicstyletransfer_tpu.ops.flash_attention import (
    flash_attention,
    reference_attention,
)


def _inputs(B=2, H=2, T=65, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    return q, k, v


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("T", [8, 65, 130])
    def test_matches_reference(self, causal, T):
        q, k, v = _inputs(T=T)
        lens = jnp.asarray([T, max(T // 2, 1)], jnp.int32)
        ref = reference_attention(q, k, v, lens, causal, 1 / np.sqrt(16))
        out = flash_attention(q, k, v, lens, causal, None, True)
        for b in range(2):
            L = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(out)[b, :, :L],
                np.asarray(ref)[b, :, :L],
                rtol=1e-5,
                atol=1e-5,
            )

    def test_fully_padded_rows_are_finite(self):
        q, k, v = _inputs(T=16)
        lens = jnp.asarray([4, 0], jnp.int32)
        out = flash_attention(q, k, v, lens, False, None, True)
        assert np.all(np.isfinite(np.asarray(out)))
        # zero-length batch row: all outputs zero
        np.testing.assert_array_equal(np.asarray(out)[1], 0.0)

    def test_gradients_match_reference(self):
        q, k, v = _inputs(T=33)
        lens = jnp.asarray([33, 20], jnp.int32)

        def lf(q, k, v):
            return jnp.sum(flash_attention(q, k, v, lens, True, None, True)[:, :, :20] ** 2)

        def lr(q, k, v):
            return jnp.sum(
                reference_attention(q, k, v, lens, True, 1 / np.sqrt(16))[:, :, :20] ** 2
            )

        gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestFlashInModel:
    def test_model_forward_matches_dense_path(self):
        """StyleVAE with use_flash_attention must match the dense path."""
        from musicstyletransfer_tpu.models import init_params, make_model
        from tests.test_model import tiny_config

        import dataclasses

        cfg_dense = tiny_config(vocab=10, classes=3, latent=8, size=16,
                                heads=2, layers=1)
        tc_flash = dataclasses.replace(
            cfg_dense.encoder_config.transformer_config,
            use_flash_attention=True,
            flash_min_seq_len=0,  # force flash at tiny test lengths
        )
        cfg_flash = dataclasses.replace(
            cfg_dense,
            encoder_config=dataclasses.replace(
                cfg_dense.encoder_config, transformer_config=tc_flash
            ),
            decoder_config=dataclasses.replace(
                cfg_dense.decoder_config, transformer_config=tc_flash
            ),
        )
        m_dense = make_model(cfg_dense)
        m_flash = make_model(cfg_flash)
        params = init_params(m_dense, jax.random.key(0), max_seq_len=6)

        B, L = 2, 6
        rng = np.random.default_rng(0)
        tokens = np.concatenate(
            [np.full((B, 1), 1), rng.integers(3, 10, (B, L))], axis=1
        ).astype(np.int32)
        tokens[0, 5:] = 0  # PAD tail
        seq_lens = jnp.asarray([5, 7], jnp.int32)
        classes = jnp.asarray([0, 1], jnp.int32)

        ld, mud, _ = m_dense.apply(
            {"params": params}, jnp.asarray(tokens), seq_lens, classes, train=False
        )
        lf, muf, _ = m_flash.apply(
            {"params": params}, jnp.asarray(tokens), seq_lens, classes, train=False
        )
        np.testing.assert_allclose(np.asarray(mud), np.asarray(muf), atol=1e-4)
        # Compare logits at valid positions only.
        np.testing.assert_allclose(
            np.asarray(ld)[1], np.asarray(lf)[1], atol=1e-3
        )


class TestFlashBackwardPallas:
    """The backward pass is its own pair of Pallas kernels (dq, dk/dv)."""

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("T", [16, 130, 300])
    def test_grads_vs_reference(self, causal, T):
        q, k, v = _inputs(T=T, D=16)
        lens = jnp.asarray([T, max(T * 2 // 3, 1)], jnp.int32)
        Lv = int(lens[1])

        def lf(q, k, v):
            o = flash_attention(q, k, v, lens, causal, None, True)
            return jnp.sum(jnp.cos(o[:, :, :Lv]) ** 2)

        def lr(q, k, v):
            o = reference_attention(q, k, v, lens, causal, 1 / np.sqrt(16))
            return jnp.sum(jnp.cos(o[:, :, :Lv]) ** 2)

        gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4,
                err_msg=f"d{name} causal={causal} T={T}",
            )

    def test_zero_length_rows_give_zero_grads(self):
        q, k, v = _inputs(T=16)
        lens = jnp.asarray([8, 0], jnp.int32)

        def lf(q, k, v):
            return jnp.sum(flash_attention(q, k, v, lens, True, None, True))

        gq, gk, gv = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        assert np.all(np.isfinite(np.asarray(gq)))
        np.testing.assert_array_equal(np.asarray(gk)[1], 0.0)
        np.testing.assert_array_equal(np.asarray(gv)[1], 0.0)


class TestFlashStreaming:
    """HBM-streaming K/V path (T >= _STREAM_THRESHOLD on hardware).

    Interpreter runs shrink the block/threshold via monkeypatch so the
    multi-block accumulation, causal index-map clamping, and padding
    masking are all exercised at CPU-feasible sizes.
    """

    @pytest.fixture()
    def small_stream(self, monkeypatch):
        import importlib

        fa = importlib.import_module(
            "musicstyletransfer_tpu.ops.flash_attention"
        )
        monkeypatch.setattr(fa, "_STREAM_THRESHOLD", 128)
        monkeypatch.setattr(fa, "_STREAM_BLOCK", 64)
        return fa

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("T", [128, 200, 256])
    def test_forward_matches_reference(self, small_stream, causal, T):
        q, k, v = _inputs(T=T)
        lens = jnp.asarray([T, max(T * 2 // 3, 1)], jnp.int32)
        ref = reference_attention(q, k, v, lens, causal, 1 / np.sqrt(16))
        out = flash_attention(q, k, v, lens, causal, None, True)
        for b in range(2):
            L = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(out)[b, :, :L],
                np.asarray(ref)[b, :, :L],
                rtol=1e-5, atol=1e-5,
                err_msg=f"b={b} causal={causal} T={T}",
            )

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_reference(self, small_stream, causal):
        T = 192
        q, k, v = _inputs(T=T)
        lens = jnp.asarray([T, 100], jnp.int32)

        def lf(q, k, v):
            o = flash_attention(q, k, v, lens, causal, None, True)
            return jnp.sum(jnp.cos(o[:, :, :100]) ** 2)

        def lr(q, k, v):
            o = reference_attention(q, k, v, lens, causal, 1 / np.sqrt(16))
            return jnp.sum(jnp.cos(o[:, :, :100]) ** 2)

        gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4,
                err_msg=f"d{name} causal={causal}",
            )

    def test_zero_length_rows(self, small_stream):
        q, k, v = _inputs(T=128)
        lens = jnp.asarray([64, 0], jnp.int32)
        out = flash_attention(q, k, v, lens, False, None, True)
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_array_equal(np.asarray(out)[1], 0.0)

        def lf(q, k, v):
            return jnp.sum(flash_attention(q, k, v, lens, True, None, True))

        gq, gk, gv = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        assert np.all(np.isfinite(np.asarray(gq)))
        np.testing.assert_array_equal(np.asarray(gk)[1], 0.0)
        np.testing.assert_array_equal(np.asarray(gv)[1], 0.0)

    def test_streaming_selected_above_threshold(self, small_stream):
        """The dispatcher must route T >= threshold through streaming."""
        called = {}
        orig = small_stream._flash_forward_streaming

        def spy(*a, **kw):
            called["yes"] = True
            return orig(*a, **kw)

        small_stream._flash_forward_streaming = spy
        try:
            q, k, v = _inputs(T=130)
            lens = jnp.asarray([130, 64], jnp.int32)
            small_stream.flash_attention(q, k, v, lens, True, None, True)
        finally:
            small_stream._flash_forward_streaming = orig
        assert called.get("yes")


class TestStreamingFullCotangents:
    """Regression: the streaming dK/dV kernel must keep contributions from
    query rows at/after the KEY count (valid_len counts keys — in ring
    off-diagonal calls the query chunk is a different range entirely).
    The plain grads test slices its loss below valid_len, which let a
    q-block gate drop ~all of dK/dV for short key counts unnoticed."""

    @pytest.fixture()
    def small_stream(self, monkeypatch):
        import importlib

        fa = importlib.import_module(
            "musicstyletransfer_tpu.ops.flash_attention"
        )
        monkeypatch.setattr(fa, "_STREAM_THRESHOLD", 128)
        monkeypatch.setattr(fa, "_STREAM_BLOCK", 64)
        return fa

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_with_unsliced_loss(self, small_stream, causal):
        T = 192
        q, k, v = _inputs(T=T)
        # Key count inside the FIRST streaming block: q blocks 1..2 hold
        # globally-valid queries past it that still produce dK/dV.
        lens = jnp.asarray([T, 50], jnp.int32)

        def lf(q, k, v):
            o = flash_attention(q, k, v, lens, causal, None, True)
            return jnp.sum(jnp.cos(o) ** 2)  # cotangents on EVERY row

        def lr(q, k, v):
            o = reference_attention(q, k, v, lens, causal, 1 / np.sqrt(16))
            return jnp.sum(jnp.cos(o) ** 2)

        gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4,
                err_msg=f"d{name} causal={causal}",
            )

    def test_ring_through_streaming_chunks(self, small_stream, cpu_devices):
        """Ring attention whose per-chunk calls route through the
        STREAMING kernels (chunk length >= the patched threshold):
        forward and grads must still match plain attention."""
        from musicstyletransfer_tpu.ops import (
            reference_attention as ref_attn,
            ring_attention_sharded,
        )
        from musicstyletransfer_tpu.parallel import make_mesh

        mesh = make_mesh(cpu_devices[:8], tp=2)  # Tl = 128 >= threshold
        rng = np.random.default_rng(11)
        B, H, T, D = 4, 2, 256, 8  # B divides the mesh's data axis
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
            for _ in range(3)
        )
        key_lens = jnp.asarray([256, 150, 97, 200], jnp.int32)
        sm = 1.0 / np.sqrt(D)
        w = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))

        def f_ring(q, k, v):
            out = ring_attention_sharded(
                q, k, v, key_lens, causal=True, mesh=mesh, interpret=True
            )
            return jnp.sum(out * w)

        def f_ref(q, k, v):
            return jnp.sum(ref_attn(q, k, v, key_lens, True, sm) * w)

        np.testing.assert_allclose(
            np.asarray(ring_attention_sharded(
                q, k, v, key_lens, causal=True, mesh=mesh, interpret=True
            )),
            np.asarray(ref_attn(q, k, v, key_lens, True, sm)),
            atol=1e-5,
        )
        g_ring = jax.jit(jax.grad(f_ring, argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ring, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4)
