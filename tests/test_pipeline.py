"""Pipeline parallelism (parallel/pipeline.py) on the CPU mesh: the
pipelined stack must equal sequential stage application — forward and
gradients — for both a plain MLP stage and a real transformer layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicstyletransfer_tpu.parallel import make_mesh
from musicstyletransfer_tpu.parallel.pipeline import pipeline_apply


def _mlp_stage(params, h):
    return jnp.tanh(h @ params["w"] + params["b"])


def _stacked_mlp_params(n_stages, d, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(
            rng.normal(scale=0.5, size=(n_stages, d, d)).astype(np.float32)
        ),
        "b": jnp.asarray(
            rng.normal(scale=0.1, size=(n_stages, d)).astype(np.float32)
        ),
    }


def _sequential(stage_fn, stage_params, x, n_stages):
    h = x
    for i in range(n_stages):
        h = stage_fn(jax.tree.map(lambda p: p[i], stage_params), h)
    return h


class TestPipelineMLP:
    @pytest.mark.parametrize("pp,microbatches", [(2, 4), (4, 2), (4, 8)])
    def test_forward_matches_sequential(self, cpu_devices, pp, microbatches):
        mesh = make_mesh(cpu_devices[:8], tp=pp)
        d, B = 8, 8
        params = _stacked_mlp_params(pp, d)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
        got = pipeline_apply(
            _mlp_stage, params, x, mesh=mesh, microbatches=microbatches
        )
        want = _sequential(_mlp_stage, params, x, pp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_grads_match_sequential(self, cpu_devices):
        """Backward through the pipeline (scan + ppermute transpose) is the
        mirrored pipeline; grads wrt params AND input must match."""
        pp, B, d = 4, 8, 8
        mesh = make_mesh(cpu_devices[:8], tp=pp)
        params = _stacked_mlp_params(pp, d, seed=2)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))

        def f_pipe(params, x):
            out = pipeline_apply(
                _mlp_stage, params, x, mesh=mesh, microbatches=4
            )
            return jnp.sum(out * w)

        def f_seq(params, x):
            return jnp.sum(_sequential(_mlp_stage, params, x, pp) * w)

        gp, gx = jax.jit(jax.grad(f_pipe, argnums=(0, 1)))(params, x)
        rp, rx = jax.grad(f_seq, argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-5)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(rp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_rejects_bad_shapes(self, cpu_devices):
        mesh = make_mesh(cpu_devices[:8], tp=2)
        params = _stacked_mlp_params(4, 8)  # 4 stages on a 2-wide axis
        x = jnp.zeros((8, 8), jnp.float32)
        with pytest.raises(AssertionError, match="stage_params leading"):
            pipeline_apply(_mlp_stage, params, x, mesh=mesh, microbatches=4)
        with pytest.raises(AssertionError):
            pipeline_apply(
                _mlp_stage, _stacked_mlp_params(2, 8), x,
                mesh=mesh, microbatches=3,  # 8 % 3 != 0
            )


class TestPipelineTransformerLayer:
    def test_transformer_stage_matches_sequential(self, cpu_devices):
        """A stack of real TransformerLayers pipelined over 2 devices equals
        running them back to back (the intended production stage_fn)."""
        from musicstyletransfer_tpu.models.config import TransformerConfig
        from musicstyletransfer_tpu.models.transformer import TransformerLayer

        pp, B, T, d = 2, 4, 6, 16
        mesh = make_mesh(cpu_devices[:8], tp=pp)
        cfg = TransformerConfig(model_size=d, num_layers=1, num_heads=2,
                                dropout=0.0)
        layer = TransformerLayer(config=cfg, causal=False)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))

        def stage_fn(params, h):
            # The pipeline passes activations only; the mask is derived per
            # microbatch (all-valid here — masking itself is pinned by the
            # attention tests).
            key_mask = jnp.ones(h.shape[:2], jnp.int32)
            return layer.apply({"params": params}, h, key_mask, False)

        init_mask = jnp.ones((B, T), jnp.int32)
        p0 = layer.init(jax.random.key(0), x, init_mask, False)["params"]
        p1 = layer.init(jax.random.key(1), x, init_mask, False)["params"]
        stacked = jax.tree.map(
            lambda a, b: jnp.stack([a, b]), p0, p1
        )

        got = pipeline_apply(
            stage_fn, stacked, x, mesh=mesh, microbatches=2
        )
        want = stage_fn(p1, stage_fn(p0, x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
