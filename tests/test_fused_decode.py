"""Fused Pallas decode kernel (ops/fused_decode.py) vs the XLA loop.

Runs the kernel in Pallas interpreter mode on CPU. The deterministic modes
(teacher-forced, greedy) are cross-checked exactly against the flax
decode_step loop; the sampled mode needs the TPU hardware PRNG and is
exercised by bench.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicstyletransfer_tpu.inference.decode import decode_sampled
from musicstyletransfer_tpu.midi.vocab import EOS_ID, PAD_ID, SOS_ID
from musicstyletransfer_tpu.models import (
    DecoderConfig,
    EncoderConfig,
    ModelConfig,
    TransformerConfig,
    init_params,
    make_model,
)
from musicstyletransfer_tpu.models.vae import StyleVAE
from musicstyletransfer_tpu.ops.fused_decode import (
    fused_decode,
    supports_fused_decode,
)


def fused_config(dtype="float32", layers=1, d=128, vocab=293):
    tc = TransformerConfig(
        model_size=d, dropout=0.0, num_layers=layers, num_heads=8,
        vocab_size=vocab,
    )
    return ModelConfig(
        encoder_config=EncoderConfig(
            transformer_config=tc, latent_dim=32, num_classes=2,
            input_dim=vocab,
        ),
        decoder_config=DecoderConfig(
            transformer_config=tc, latent_dim=32, num_classes=2,
            output_dim=vocab,
        ),
        dtype=dtype,
    )


@pytest.fixture(scope="module", params=["float32"])
def setup(request):
    cfg = fused_config(dtype=request.param)
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0), max_seq_len=8)
    B = 4
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(B, 32)).astype(np.float32))
    classes = jnp.asarray(rng.integers(0, 2, (B,)).astype(np.int32))
    x0 = model.apply({"params": params}, z, classes,
                     method=StyleVAE.decode_init)
    return cfg, model, params, z, classes, x0


def xla_forced_logits(model, params, z, classes, forced, T):
    """Teacher-forced logit trajectory via the flax decode_step loop."""
    cache = model.apply({"params": params}, z, classes, T + 1,
                        method=StyleVAE.decode_prefill)
    last = jnp.full((z.shape[0],), SOS_ID, jnp.int32)
    out = []
    for t in range(1, T):
        lg, cache = model.apply(
            {"params": params}, last, cache, jnp.asarray(t),
            method=StyleVAE.decode_step,
        )
        out.append(lg)
        last = forced[:, t]
    return jnp.stack(out, axis=1)  # [B, T-1, V]


class TestForcedParity:
    def test_logits_match_xla_loop(self, setup):
        cfg, model, params, z, classes, x0 = setup
        T = 12
        rng = np.random.default_rng(1)
        forced = jnp.asarray(
            rng.integers(3, 293, (z.shape[0], T)).astype(np.int32)
        )
        _, _, logits = fused_decode(
            cfg, params, x0, T, jnp.asarray(0), mode="forced",
            forced_tokens=forced, interpret=True,
        )
        ref = xla_forced_logits(model, params, z, classes, forced, T)
        np.testing.assert_allclose(
            np.asarray(logits[:, 1:T, :]), np.asarray(ref), atol=1e-4
        )

    def test_two_layer_decoder(self):
        cfg = fused_config(layers=2)
        model = make_model(cfg)
        params = init_params(model, jax.random.key(3), max_seq_len=8)
        B, T = 2, 8
        rng = np.random.default_rng(2)
        z = jnp.asarray(rng.normal(size=(B, 32)).astype(np.float32))
        classes = jnp.zeros((B,), jnp.int32)
        x0 = model.apply({"params": params}, z, classes,
                         method=StyleVAE.decode_init)
        forced = jnp.asarray(rng.integers(3, 293, (B, T)).astype(np.int32))
        _, _, logits = fused_decode(
            cfg, params, x0, T, jnp.asarray(0), mode="forced",
            forced_tokens=forced, interpret=True,
        )
        ref = xla_forced_logits(model, params, z, classes, forced, T)
        np.testing.assert_allclose(
            np.asarray(logits[:, 1:T, :]), np.asarray(ref), atol=1e-4
        )


class TestGreedyParity:
    def test_tokens_and_scores_match_xla_greedy(self, setup):
        cfg, model, params, z, classes, x0 = setup
        T = 16
        f_seqs, f_scores = fused_decode(
            cfg, params, x0, T, jnp.asarray(0), mode="greedy", interpret=True
        )
        x_seqs, x_scores = decode_sampled(
            model, params, z, classes, T, jax.random.key(0), greedy=True,
            use_fused=False,
        )
        np.testing.assert_array_equal(np.asarray(f_seqs), np.asarray(x_seqs))
        np.testing.assert_allclose(
            np.asarray(f_scores), np.asarray(x_scores), rtol=1e-4, atol=1e-4
        )

    def test_route_through_decode_sampled(self, setup):
        """use_fused=True routes decode_sampled through the kernel."""
        cfg, model, params, z, classes, x0 = setup
        T = 10
        f_seqs, _ = decode_sampled(
            model, params, z, classes, T, jax.random.key(0), greedy=True,
            use_fused=True,
        )
        x_seqs, _ = decode_sampled(
            model, params, z, classes, T, jax.random.key(0), greedy=True,
            use_fused=False,
        )
        np.testing.assert_array_equal(np.asarray(f_seqs), np.asarray(x_seqs))

    def test_eos_early_exit_pads_tail(self, setup):
        """Bias the head toward EOS: every row finishes at t=1 and the
        kernel's early exit must leave PAD (not garbage) in the tail."""
        cfg, model, params, z, classes, x0 = setup
        T = 12
        bias = np.zeros((293,), np.float32)
        bias[EOS_ID] = 1e4
        biased = jax.tree_util.tree_map(lambda x: x, params)
        biased["decoder"]["output_layer"]["bias"] = jnp.asarray(bias)
        seqs, _ = fused_decode(
            cfg, biased, x0, T, jnp.asarray(0), mode="greedy", interpret=True
        )
        s = np.asarray(seqs)
        assert np.all(s[:, 0] == SOS_ID)
        assert np.all(s[:, 1] == EOS_ID)
        assert np.all(s[:, 2:] == PAD_ID)


class TestBf16:
    def test_forced_close_to_xla(self):
        cfg = fused_config(dtype="bfloat16")
        model = make_model(cfg)
        params = init_params(model, jax.random.key(1), max_seq_len=8)
        B, T = 2, 8
        rng = np.random.default_rng(5)
        z = jnp.asarray(rng.normal(size=(B, 32)).astype(np.float32))
        classes = jnp.zeros((B,), jnp.int32)
        x0 = model.apply({"params": params}, z, classes,
                         method=StyleVAE.decode_init)
        forced = jnp.asarray(rng.integers(3, 293, (B, T)).astype(np.int32))
        _, _, logits = fused_decode(
            cfg, params, x0, T, jnp.asarray(0), mode="forced",
            forced_tokens=forced, interpret=True,
        )
        ref = xla_forced_logits(model, params, z, classes, forced, T)
        # bf16 activations: the kernel does softmax statistics in f32 while
        # flax softmaxes in bf16 — allow bf16-scale disagreement.
        np.testing.assert_allclose(
            np.asarray(logits[:, 1:T, :]), np.asarray(ref), atol=0.15
        )


class TestEligibility:
    def test_flagship_supported(self):
        cfg = fused_config(dtype="bfloat16")
        assert supports_fused_decode(cfg, batch=32, max_len=130)

    def test_service_batch_tiles(self):
        """A 256-row service batch no longer falls back to the XLA loop:
        it runs as a sequential grid over VMEM-sized batch tiles."""
        from musicstyletransfer_tpu.ops.fused_decode import select_batch_tile

        cfg = fused_config(dtype="bfloat16")
        assert supports_fused_decode(cfg, batch=256, max_len=130)
        tile = select_batch_tile(cfg, 256, 130)
        assert tile is not None and tile < 256 and 256 % tile == 0
        assert tile % 8 == 0
        # ...but the AUTO path caps sequential tiles at 2: at 8 tiles the
        # XLA loop's big-batch matmuls win (measured on v5e).
        assert not supports_fused_decode(cfg, batch=256, max_len=130,
                                         max_grid=2)
        assert supports_fused_decode(cfg, batch=32, max_len=130, max_grid=2)

    def test_no_tile_for_absurd_shapes(self):
        from musicstyletransfer_tpu.ops.fused_decode import select_batch_tile

        # One tile row's cache alone blows the budget: nothing admissible.
        cfg = fused_config(dtype="bfloat16")
        assert select_batch_tile(cfg, 8, 200_000) is None


class TestFilterSupport:
    """The kernel's sortless top-k/top-p (bisection order statistics) must
    keep EXACTLY the token sets of the XLA path's sort-based
    ``_filter_logits`` — a support mismatch would be a correctness bug,
    unlike the documented PRNG draw difference. ``filter_support`` is pure
    jnp, so the equivalence is pinned here on CPU; sampling through it on
    hardware is covered by scripts/tpu-parity.py."""

    def _random_logits(self, seed, B=8, V=293):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.normal(scale=3.0, size=(B, V)).astype(
            np.float32))

    @pytest.mark.parametrize("top_k", [1, 3, 7, 50, 293])
    def test_top_k_matches_xla_filter(self, top_k):
        from musicstyletransfer_tpu.inference.decode import _filter_logits
        from musicstyletransfer_tpu.ops.fused_decode import filter_support

        logits = self._random_logits(top_k)
        ref = np.asarray(_filter_logits(logits, top_k, 0.0))
        got = np.asarray(filter_support(logits, top_k, 0.0))
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("top_p", [0.1, 0.5, 0.9, 0.99])
    def test_top_p_matches_xla_filter(self, top_p):
        from musicstyletransfer_tpu.inference.decode import _filter_logits
        from musicstyletransfer_tpu.ops.fused_decode import filter_support

        logits = self._random_logits(int(top_p * 100))
        ref = np.asarray(_filter_logits(logits, 0, top_p))
        got = np.asarray(filter_support(logits, 0, top_p))
        np.testing.assert_array_equal(got, ref)

    def test_combined_filters_match(self):
        from musicstyletransfer_tpu.inference.decode import _filter_logits
        from musicstyletransfer_tpu.ops.fused_decode import filter_support

        logits = self._random_logits(42)
        ref = np.asarray(_filter_logits(logits, 10, 0.7))
        got = np.asarray(filter_support(logits, 10, 0.7))
        np.testing.assert_array_equal(got, ref)

    def test_top_k_tie_semantics(self):
        """Duplicate-counting k-th statistic: with logits [5,5,5,3,...],
        top_k=2's threshold is 5 and all THREE fives survive (the XLA
        path's ``logits < kth`` keeps ties) while 3 does not."""
        from musicstyletransfer_tpu.inference.decode import _filter_logits
        from musicstyletransfer_tpu.ops.fused_decode import filter_support

        row = np.full((1, 293), -10.0, np.float32)
        row[0, [4, 100, 292]] = 5.0
        row[0, 7] = 3.0
        logits = jnp.asarray(row)
        got = np.asarray(filter_support(logits, 2, 0.0))[0]
        assert (got[[4, 100, 292]] == 5.0).all()
        assert got[7] < -1e29
        ref = np.asarray(_filter_logits(logits, 2, 0.0))[0]
        np.testing.assert_array_equal(got, ref)

    def test_top_p_always_keeps_argmax(self):
        from musicstyletransfer_tpu.ops.fused_decode import filter_support

        # One dominant token, tiny top_p: support degenerates to argmax.
        logits = self._random_logits(7)
        got = np.asarray(filter_support(logits, 0, 1e-6))
        best = np.argmax(np.asarray(logits), axis=-1)
        for b in range(got.shape[0]):
            assert got[b, best[b]] > -1e29
            kept = np.flatnonzero(got[b] > -1e29)
            assert list(kept) == [best[b]]

    def test_float_sort_keys_order_isomorphic(self):
        """The f32 -> int32 key transform must preserve ORDER exactly,
        including negatives, denormals, +-0 (which must tie), and the
        _NEG_INF sentinel — integer compares on keys stand in for float
        compares in the bisection."""
        from musicstyletransfer_tpu.ops.fused_decode import _float_sort_keys

        # (denormals excluded: XLA flushes them to zero, numpy does not —
        # an FTZ artifact orthogonal to the key transform)
        vals = np.array([
            -1e30, -3.5e4, -2.0, -1.0, -1e-30, -0.0, 0.0, 1e-30, 0.5,
            1.0, 1.0000001, 7.25e8, 3.0e38,
        ], np.float32)
        keys = np.asarray(_float_sort_keys(jnp.asarray(vals[None, :])))[0]
        for i in range(len(vals)):
            for j in range(len(vals)):
                assert (keys[i] < keys[j]) == (vals[i] < vals[j]), (i, j)
                assert (keys[i] == keys[j]) == (vals[i] == vals[j]), (i, j)

    def test_randomized_cross_check_vs_xla_filter(self):
        """500 random rows x several (k, p) combos, including rows with
        heavy duplicate plateaus (rounded logits force exact ties at the
        cut): keep sets must match the sort-based filter exactly."""
        from musicstyletransfer_tpu.inference.decode import _filter_logits
        from musicstyletransfer_tpu.ops.fused_decode import filter_support

        rng = np.random.default_rng(2024)
        smooth = rng.normal(scale=4.0, size=(250, 293)).astype(np.float32)
        tied = np.round(
            rng.normal(scale=2.0, size=(250, 293)) * 2
        ).astype(np.float32) / 2  # half-integer plateaus
        logits = jnp.asarray(np.concatenate([smooth, tied]))
        for top_k, top_p in [(5, 0.0), (64, 0.0), (0, 0.3), (0, 0.95),
                             (16, 0.8)]:
            ref = np.asarray(_filter_logits(logits, top_k, top_p))
            got = np.asarray(filter_support(logits, top_k, top_p))
            np.testing.assert_array_equal(
                got > -1e29, ref > -1e29,
                err_msg=f"keep-set mismatch at k={top_k} p={top_p}",
            )

    def test_filtered_budget_and_eligibility(self):
        """Filtering adds the bisection's [B, V] transients to the VMEM
        estimate; the flagship config must stay eligible WITH filtering on
        (that is the point of in-kernel support) and the auto path must
        now accept top-k/top-p requests."""
        cfg = fused_config(dtype="bfloat16")
        assert supports_fused_decode(cfg, batch=32, max_len=130,
                                     filtered=True)
        from musicstyletransfer_tpu.inference.decode import _fused_eligible
        from musicstyletransfer_tpu.models import make_model
        from musicstyletransfer_tpu.ops.flash_attention import (
            should_interpret,
        )

        if not should_interpret():  # TPU backend: auto path says yes
            model = make_model(cfg)
            assert _fused_eligible(model, 32, 130, top_k=5, top_p=0.9,
                                   greedy=False)


class TestSampleBits:
    def test_uniform_from_bits_handles_signed_int32(self):
        """pltpu.prng_random_bits is typed int32: the uniform transform
        must not go negative for negative bit patterns (negative u ->
        NaN Gumbel -> garbage out-of-vocab tokens on hardware)."""
        from musicstyletransfer_tpu.ops.fused_decode import _uniform_from_bits

        bits = jnp.asarray(
            [-(2 ** 31), -1, 0, 1, 2 ** 31 - 1, -123456789], jnp.int32
        )
        u = np.asarray(_uniform_from_bits(bits))
        assert np.all(u > 0.0) and np.all(u < 1.0)
        gumbel = -np.log(-np.log(u))
        assert np.all(np.isfinite(gumbel))


class TestBatchTiling:
    def test_tiled_forced_matches_whole_batch(self, setup):
        """grid>1 (batch_tile < B) is exact: forced logits identical to the
        single-tile kernel (rows are independent)."""
        cfg, model, params, z, classes, x0 = setup
        T = 10
        rng = np.random.default_rng(7)
        forced = jnp.asarray(
            rng.integers(3, 293, (z.shape[0], T)).astype(np.int32)
        )
        _, _, whole = fused_decode(
            cfg, params, x0, T, jnp.asarray(0), mode="forced",
            forced_tokens=forced, interpret=True,
        )
        _, _, tiled = fused_decode(
            cfg, params, x0, T, jnp.asarray(0), mode="forced",
            forced_tokens=forced, interpret=True, batch_tile=2,
        )
        np.testing.assert_allclose(
            np.asarray(tiled), np.asarray(whole), atol=1e-5
        )

    def test_tiled_greedy_matches_xla(self, setup):
        cfg, model, params, z, classes, x0 = setup
        T = 12
        f_seqs, f_scores = fused_decode(
            cfg, params, x0, T, jnp.asarray(0), mode="greedy",
            interpret=True, batch_tile=2,
        )
        x_seqs, x_scores = decode_sampled(
            model, params, z, classes, T, jax.random.key(0), greedy=True,
            use_fused=False,
        )
        np.testing.assert_array_equal(np.asarray(f_seqs), np.asarray(x_seqs))
        np.testing.assert_allclose(
            np.asarray(f_scores), np.asarray(x_scores), rtol=1e-4, atol=1e-4
        )

    def test_bad_tile_rejected(self, setup):
        cfg, model, params, z, classes, x0 = setup
        with pytest.raises(ValueError, match="batch tile"):
            fused_decode(cfg, params, x0, 8, jnp.asarray(0), mode="greedy",
                         interpret=True, batch_tile=3)

    def test_lstm_not_supported(self):
        cfg = fused_config()
        dc = cfg.decoder_config.copy(decoder_type="lstm")
        cfg = cfg.copy(decoder_config=dc)
        assert not supports_fused_decode(cfg, batch=32, max_len=130)

    def test_odd_model_size_not_supported(self):
        cfg = fused_config(d=64)
        assert not supports_fused_decode(cfg, batch=32, max_len=130)
