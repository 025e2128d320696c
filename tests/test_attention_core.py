"""Fused short-T attention-core kernel tests (interpreter mode on CPU).

Covers ops/attention_core.py: forward/grad equivalence against the plain
XLA ground truth over the interleaved QKV layout, ragged key lengths,
odd (non-tile-aligned) sequence lengths, and the model-level path — a
TransformerEncoder with attention_core_min_seq_len enabled must match the
XLA attention path bit-closely, fwd and grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicstyletransfer_tpu.ops.attention_core import (
    attention_core,
    reference_core,
)


def _qkv_inputs(B=2, H=2, T=65, hd=16, seed=0):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.normal(size=(B, T, H * 3 * hd)), jnp.float32)
    return qkv


class TestAttentionCore:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("T", [8, 65, 130, 513])
    def test_matches_reference(self, causal, T):
        qkv = _qkv_inputs(T=T)
        lens = jnp.asarray([T, max(T // 2, 1)], jnp.int32)
        ref = reference_core(qkv, lens, 2, causal)
        out = attention_core(qkv, lens, 2, causal, None, True)
        # Compare valid query rows only (fully-masked rows are zeros here,
        # uniform-average in the reference — both are masked downstream).
        for b in range(2):
            L = int(lens[b]) if not causal else T
            np.testing.assert_allclose(
                np.asarray(out)[b, :L],
                np.asarray(ref)[b, :L],
                rtol=1e-5,
                atol=1e-5,
            )

    # (4, 64) -> head group G=2 and (8, 32) -> G=4 exercise the grouped
    # (G < H) grid path; the small shapes fall back to G=H (full-width
    # block). _head_group itself is pinned below.
    @pytest.mark.parametrize("H,hd", [(4, 8), (2, 32), (4, 64), (8, 32)])
    def test_head_layout(self, H, hd):
        qkv = _qkv_inputs(H=H, hd=hd, T=33)
        lens = jnp.asarray([33, 17], jnp.int32)
        ref = reference_core(qkv, lens, H, True)
        out = attention_core(qkv, lens, H, True, None, True)
        np.testing.assert_allclose(
            np.asarray(out)[0], np.asarray(ref)[0], rtol=1e-5, atol=1e-5
        )

    def test_fully_padded_rows_are_finite(self):
        qkv = _qkv_inputs(T=16)
        lens = jnp.asarray([4, 0], jnp.int32)
        out = attention_core(qkv, lens, 2, False, None, True)
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_array_equal(np.asarray(out)[1], 0.0)

    @pytest.mark.parametrize("causal", [False, True])
    def test_gradients_match_reference(self, causal):
        qkv = _qkv_inputs(T=33)
        lens = jnp.asarray([33, 20], jnp.int32)

        # Restrict the loss to valid query rows so the padded-row semantic
        # difference (zeros vs uniform average) never enters the gradient.
        def lf(qkv):
            return jnp.sum(
                attention_core(qkv, lens, 2, causal, None, True)[:, :20] ** 2
            )

        def lr(qkv):
            return jnp.sum(reference_core(qkv, lens, 2, causal)[:, :20] ** 2)

        gf = jax.grad(lf)(qkv)
        gr = jax.grad(lr)(qkv)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-5
        )

    @pytest.mark.parametrize("causal", [False, True])
    def test_xla_backward_matches_pallas_backward(self, causal):
        """xla_backward=True must produce the same gradients as the Pallas
        backward kernel AND the reference — it is the overflow-robust
        route for unstable training configs (TransformerConfig.
        attention_core_xla_backward; BASELINE.md round-5 wide NaN
        post-mortem), so any drift here silently changes training."""
        qkv = _qkv_inputs(T=33)
        lens = jnp.asarray([33, 20], jnp.int32)

        def loss(qkv, xla_bwd):
            return jnp.sum(
                attention_core(qkv, lens, 2, causal, None, True,
                               xla_bwd)[:, :20] ** 2
            )

        g_pallas = jax.grad(loss)(qkv, False)
        g_xla = jax.grad(loss)(qkv, True)
        g_ref = jax.grad(
            lambda q: jnp.sum(reference_core(q, lens, 2, causal)[:, :20] ** 2)
        )(qkv)
        np.testing.assert_allclose(
            np.asarray(g_xla), np.asarray(g_pallas), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_xla), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )

    def test_xla_backward_survives_extreme_cotangents(self):
        """At ~1e19-magnitude cotangents (the measured wide-spike regime)
        the XLA backward must stay finite."""
        qkv = _qkv_inputs(T=33)
        lens = jnp.asarray([33, 20], jnp.int32)

        def loss(qkv):
            out = attention_core(qkv, lens, 2, True, None, True, True)
            return jnp.sum(out[:, :20] * 1e19)

        g = jax.grad(loss)(qkv)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_head_group_rule(self):
        from musicstyletransfer_tpu.ops.attention_core import _head_group

        # (G * 3 * hd) % 128 == 0 with G | H — the Mosaic lane constraint.
        assert _head_group(16, 64) == 2
        assert _head_group(16, 32) == 4
        assert _head_group(8, 128) == 1  # 3*128 is already lane-aligned
        assert _head_group(4, 8) == 4  # no divisor works -> full width
        assert _head_group(2, 32) == 2

    def test_custom_scale(self):
        qkv = _qkv_inputs(T=20)
        lens = jnp.asarray([20, 20], jnp.int32)
        ref = reference_core(qkv, lens, 2, False, sm_scale=0.5)
        out = attention_core(qkv, lens, 2, False, 0.5, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestShardedCore:
    def test_dp_mesh_matches_single_device(self, cpu_devices):
        """attention_core_sharded on a pure-dp mesh == the plain kernel
        (each shard runs the whole kernel on its batch slice)."""
        from musicstyletransfer_tpu.ops.attention_core import (
            attention_core,
            attention_core_sharded,
        )
        from musicstyletransfer_tpu.parallel.mesh import make_mesh, use_mesh

        B, T, H, hd = 8, 24, 2, 16
        rng = np.random.default_rng(3)
        qkv = jnp.asarray(rng.normal(size=(B, T, H * 3 * hd)), jnp.float32)
        lens = jnp.asarray([T, 13, 7, T, 1, 9, T, 20], jnp.int32)
        single = attention_core(qkv, lens, H, True, None, True)
        mesh = make_mesh(cpu_devices[:8], tp=1)
        with use_mesh(mesh):
            sharded = jax.jit(
                lambda q, l: attention_core_sharded(
                    q, l, H, True, interpret=True
                )
            )(qkv, lens)
        np.testing.assert_allclose(
            np.asarray(single), np.asarray(sharded), rtol=1e-6, atol=1e-6
        )

    def test_model_dp_mesh_matches_xla(self, cpu_devices):
        """The full stack on a dp mesh takes the sharded-core path and
        matches the XLA attention path."""
        from musicstyletransfer_tpu.models.config import TransformerConfig
        from musicstyletransfer_tpu.models.transformer import (
            TransformerStack,
        )
        from musicstyletransfer_tpu.parallel.mesh import make_mesh, use_mesh

        def stack(core_min):
            cfg = TransformerConfig(
                model_size=32, num_layers=1, num_heads=4, dropout=0.0,
                use_flash_attention=True, flash_min_seq_len=10_000,
                attention_core_min_seq_len=core_min,
            )
            return TransformerStack(config=cfg, causal=True)

        B, T, D = 8, 16, 32
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        mask = jnp.arange(T)[None, :] < jnp.asarray([[T]] * 4 + [[9]] * 4)
        m_xla, m_core = stack(0), stack(1)
        params = m_xla.init(jax.random.PRNGKey(0), x, mask, False)
        ref = m_xla.apply(params, x, mask, False)
        mesh = make_mesh(cpu_devices[:8], tp=1)
        with use_mesh(mesh):
            out = jax.jit(lambda p, x: m_core.apply(p, x, mask, False))(
                params, x
            )
        np.testing.assert_allclose(
            np.asarray(ref) * np.asarray(mask)[:, :, None],
            np.asarray(out) * np.asarray(mask)[:, :, None],
            rtol=0, atol=1e-5,
        )


class TestTensorParallelCore:
    """attention_core_tp: projection + interleave + kernel per head shard
    under one shard_map must match the mesh-free composition — fwd and the
    weight/activation gradients (the psum for dX of the model-replicated
    activation is the transpose shard_map inserts)."""

    def _weights(self, D=32, H=4, hd=8, seed=7):
        # fan-in scaling keeps logits O(1): unscaled N(0,1) weights drive
        # the softmax into saturation, where f32 summation-order noise
        # between the sharded and mesh-free matmuls flips near-argmax rows.
        rng = np.random.default_rng(seed)
        mk = lambda *s: jnp.asarray(  # noqa: E731
            rng.normal(size=s) * (s[0] ** -0.5), jnp.float32
        )
        return (mk(D, H * hd), mk(H * hd), mk(D, H * hd), mk(H * hd),
                mk(D, H * hd), mk(H * hd))

    @staticmethod
    def _interleave(wq, bq, wk, bk, wv, bv, H, hd):
        D = wq.shape[0]
        w = jnp.stack(
            [wq.reshape(D, H, hd), wk.reshape(D, H, hd),
             wv.reshape(D, H, hd)],
            axis=2,
        ).reshape(D, H * 3 * hd)
        b = jnp.stack(
            [bq.reshape(H, hd), bk.reshape(H, hd), bv.reshape(H, hd)],
            axis=1,
        ).reshape(H * 3 * hd)
        return w, b

    @pytest.mark.parametrize("tp", [2, 4])
    def test_matches_mesh_free(self, cpu_devices, tp):
        from musicstyletransfer_tpu.ops.attention_core import (
            attention_core,
            attention_core_tp,
        )
        from musicstyletransfer_tpu.parallel.mesh import make_mesh, use_mesh

        B, T, D, H, hd = 8, 24, 32, 4, 8
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        lens = jnp.asarray([T, 13, 7, T, 1, 9, T, 20], jnp.int32)
        ws = self._weights(D, H, hd)
        w, b = self._interleave(*ws, H, hd)
        ref = attention_core(x @ w + b, lens, H, True, None, True)
        mesh = make_mesh(cpu_devices[:8], tp=tp)
        with use_mesh(mesh):
            out = jax.jit(
                lambda x, *ws: attention_core_tp(
                    x, *ws, lens, H, hd, True, interpret=True
                )
            )(x, *ws)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5
        )

    def test_gradients_match_mesh_free(self, cpu_devices):
        from musicstyletransfer_tpu.ops.attention_core import (
            attention_core,
            attention_core_tp,
        )
        from musicstyletransfer_tpu.parallel.mesh import make_mesh, use_mesh

        B, T, D, H, hd = 4, 16, 32, 4, 8
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        lens = jnp.asarray([T, 9, T, 5], jnp.int32)
        ws = self._weights(D, H, hd)
        valid = (jnp.arange(T)[None, :] < lens[:, None])[:, :, None]

        def loss_free(x, *ws):
            w, b = self._interleave(*ws, H, hd)
            out = attention_core(x @ w + b, lens, H, True, None, True)
            return jnp.sum(jnp.where(valid, out, 0.0) ** 2)

        def loss_tp(x, *ws):
            out = attention_core_tp(
                x, *ws, lens, H, hd, True, interpret=True
            )
            return jnp.sum(jnp.where(valid, out, 0.0) ** 2)

        lf, gf = jax.value_and_grad(loss_free, argnums=tuple(range(7)))(
            x, *ws
        )
        mesh = make_mesh(cpu_devices[:8], tp=2)
        with use_mesh(mesh):
            lt, gt = jax.jit(
                jax.value_and_grad(loss_tp, argnums=tuple(range(7)))
            )(x, *ws)
        np.testing.assert_allclose(float(lf), float(lt), rtol=1e-5)
        for a, b in zip(gf, gt):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_model_tp_mesh_matches_xla(self, cpu_devices):
        """The full stack on a tp=2 mesh takes the tp-core path and matches
        the XLA attention path (mesh-free), fwd."""
        from musicstyletransfer_tpu.models.config import TransformerConfig
        from musicstyletransfer_tpu.models.transformer import (
            TransformerStack,
        )
        from musicstyletransfer_tpu.parallel.mesh import make_mesh, use_mesh

        def stack(core_min):
            cfg = TransformerConfig(
                model_size=32, num_layers=1, num_heads=4, dropout=0.0,
                use_flash_attention=True, flash_min_seq_len=10_000,
                attention_core_min_seq_len=core_min,
            )
            return TransformerStack(config=cfg, causal=True)

        B, T, D = 8, 16, 32
        rng = np.random.default_rng(17)
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        mask = jnp.arange(T)[None, :] < jnp.asarray([[T]] * 4 + [[9]] * 4)
        m_xla, m_core = stack(0), stack(1)
        params = m_xla.init(jax.random.PRNGKey(0), x, mask, False)
        ref = m_xla.apply(params, x, mask, False)
        mesh = make_mesh(cpu_devices[:8], tp=2)
        with use_mesh(mesh):
            out = jax.jit(lambda p, x: m_core.apply(p, x, mask, False))(
                params, x
            )
        np.testing.assert_allclose(
            np.asarray(ref) * np.asarray(mask)[:, :, None],
            np.asarray(out) * np.asarray(mask)[:, :, None],
            rtol=0, atol=1e-5,
        )

    def test_head_indivisible_tp_falls_back(self, cpu_devices):
        """heads % tp != 0 keeps the XLA path (eligibility gate) rather
        than slicing a head across model shards."""
        from musicstyletransfer_tpu.models.transformer import (
            MultiHeadSelfAttention,
        )
        from musicstyletransfer_tpu.parallel.mesh import make_mesh, use_mesh

        attn = MultiHeadSelfAttention(
            model_size=32, num_heads=2, causal=True, use_flash=True,
            flash_min_seq_len=10_000, core_min_seq_len=1,
        )
        x = jnp.zeros((8, 16, 32), jnp.float32)
        mesh = make_mesh(cpu_devices[:8], tp=4)
        with use_mesh(mesh):
            bound = attn.bind(
                attn.init(jax.random.PRNGKey(0), x, jnp.ones((8, 16), bool))
            )
            assert not bound._core_eligible(x)
        mesh2 = make_mesh(cpu_devices[:8], tp=2)
        with use_mesh(mesh2):
            assert bound._core_eligible(x)


class TestModelPathEquivalence:
    """The encoder/decoder stacks with the core enabled must match the XLA
    attention path — fwd and grads — including the weight-side column
    permutation in _qkv_interleaved. Parameterized over the core's
    backward route (Pallas kernel vs the overflow-robust XLA einsums) so
    attention_core_xla_backward is pinned at the MODEL level too."""

    def _stack(self, core_min, xla_backward=False):
        from musicstyletransfer_tpu.models.config import TransformerConfig
        from musicstyletransfer_tpu.models.transformer import (
            TransformerStack,
        )

        cfg = TransformerConfig(
            model_size=32,
            num_layers=2,
            num_heads=4,
            dropout=0.0,
            use_flash_attention=True,
            flash_min_seq_len=10_000,
            attention_core_min_seq_len=core_min,
            attention_core_xla_backward=xla_backward,
        )
        return TransformerStack(config=cfg, causal=True)

    @pytest.mark.parametrize("xla_backward", [False, True])
    def test_model_forward_and_grads_match(self, xla_backward):
        B, T, D = 3, 24, 32
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        mask = jnp.arange(T)[None, :] < jnp.asarray([[24], [13], [7]])

        m_xla = self._stack(core_min=0)
        m_core = self._stack(core_min=1, xla_backward=xla_backward)
        params = m_xla.init(jax.random.PRNGKey(0), x, mask, False)

        def loss(m):
            def f(p, x):
                out = m.apply(p, x, mask, False)
                return jnp.sum(
                    jnp.where(mask[:, :, None], out, 0.0) ** 2
                )

            return f

        # Forward: elementwise-tight on valid rows (~1e-6 on O(1) outputs).
        o_xla = m_xla.apply(params, x, mask, False)
        o_core = m_core.apply(params, x, mask, False)
        np.testing.assert_allclose(
            np.asarray(o_xla) * np.asarray(mask)[:, :, None],
            np.asarray(o_core) * np.asarray(mask)[:, :, None],
            rtol=0, atol=1e-5,
        )

        lx, gx = jax.value_and_grad(loss(m_xla))(params, x)
        lc, gc = jax.value_and_grad(loss(m_core))(params, x)
        np.testing.assert_allclose(float(lx), float(lc), rtol=1e-5)
        # Gradients: atol at the f32 cancellation noise floor. The post-LN
        # attention-weight grads here are structurally tiny (~1e-4: the
        # LayerNorms shrink upstream gradients) and assembled from O(10)
        # intermediates that nearly cancel, so the two paths' different
        # f32 summation orders legitimately differ by ~1e-5-5e-5 absolute;
        # tight elementwise correctness is pinned by TestAttentionCore's
        # op-level grad checks against the analytic reference.
        flat_x = jax.tree_util.tree_leaves(gx)
        flat_c = jax.tree_util.tree_leaves(gc)
        for a, b in zip(flat_x, flat_c):
            scale = max(float(np.max(np.abs(np.asarray(a)))), 1.0)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4 * scale
            )
