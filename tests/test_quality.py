"""Style-transfer quality statistics (inference/quality.py)."""

import numpy as np
import pytest

from musicstyletransfer_tpu.inference.quality import (
    js_divergence,
    pitch_class_histogram,
)
from musicstyletransfer_tpu.midi.vocab import note_on_id, note_off_id


class TestHelpers:
    def test_pitch_class_histogram(self):
        rows = [np.asarray([note_on_id(60), note_on_id(60), note_on_id(61),
                            note_off_id(62)])]  # offs ignored
        h = pitch_class_histogram(rows)
        assert h[0] == pytest.approx(2 / 3)  # C (60 % 12)
        assert h[1] == pytest.approx(1 / 3)  # C#
        assert h.sum() == pytest.approx(1.0)

    def test_histogram_empty_is_uniform(self):
        h = pitch_class_histogram([np.asarray([0, 1, 2])])
        np.testing.assert_allclose(h, np.full(12, 1 / 12))

    def test_js_bounds(self):
        p = np.zeros(12); p[0] = 1.0
        q = np.zeros(12); q[6] = 1.0
        assert js_divergence(p, p) == pytest.approx(0.0, abs=1e-9)
        assert js_divergence(p, q) == pytest.approx(np.log(2), rel=1e-6)
        assert js_divergence(p, q) == pytest.approx(js_divergence(q, p))


class TestTransferStats:
    def _dataset(self, batch_size):
        from musicstyletransfer_tpu.data import MelodyDataset
        from musicstyletransfer_tpu.midi.codec import Melody

        rng = np.random.default_rng(0)
        mel = {
            "a": [Melody(tokens=np.asarray(
                [note_on_id(60 + int(p)) for p in rng.integers(0, 4, 40)],
                np.int32))],
            "b": [Melody(tokens=np.asarray(
                [note_on_id(66 + int(p)) for p in rng.integers(0, 4, 40)],
                np.int32))],
        }
        return MelodyDataset(batch_size, 8, mel, shuffle=False)

    def _model(self):
        import jax

        from musicstyletransfer_tpu.models import init_params, make_model
        from tests.test_model import tiny_config

        cfg = tiny_config(vocab=293, classes=2, latent=8, size=16, heads=2,
                          layers=1)
        model = make_model(cfg)
        params = init_params(model, jax.random.key(0), max_seq_len=8)
        return model, params

    def test_wrap_padding_not_double_counted(self):
        """10 real rows at any batch size: the wrap-padded duplicates of
        the final partial batch must be masked out (Batch.n_valid), so the
        sequence count is invariant to --batch-size."""
        from musicstyletransfer_tpu.inference.quality import transfer_stats

        model, params = self._model()
        for bs in (4, 8):
            stats = transfer_stats(model, params, self._dataset(bs),
                                   num_classes=2, max_batches=10)
            assert stats["transfer_sequences"] == 20.0  # 10 rows x 2 classes

    def test_single_pass_iterable(self):
        """transfer_stats makes ONE pass: a generator (non-reiterable)
        dataset must produce the same counts as the re-iterable one."""
        from musicstyletransfer_tpu.inference.quality import transfer_stats

        model, params = self._model()
        batches = list(self._dataset(4))
        stats = transfer_stats(model, params, (b for b in batches),
                               num_classes=2, max_batches=10)
        assert stats["transfer_sequences"] == 20.0
        assert np.isfinite(stats["pitch_js_to_source_mix"])
        assert 0.0 <= stats["pitch_js_to_own_source"] <= np.log(2) + 1e-9


    def test_stats_on_tiny_model(self):
        import jax

        from musicstyletransfer_tpu.data import MelodyDataset
        from musicstyletransfer_tpu.inference.quality import transfer_stats
        from musicstyletransfer_tpu.midi.codec import Melody
        from musicstyletransfer_tpu.models import init_params, make_model
        from tests.test_model import tiny_config

        rng = np.random.default_rng(0)
        mel = {
            "a": [Melody(tokens=np.asarray(
                [note_on_id(60 + int(p)) for p in rng.integers(0, 4, 40)],
                np.int32))],
            "b": [Melody(tokens=np.asarray(
                [note_on_id(66 + int(p)) for p in rng.integers(0, 4, 40)],
                np.int32))],
        }
        ds = MelodyDataset(4, 8, mel, shuffle=False)
        cfg = tiny_config(vocab=293, classes=2, latent=8, size=16, heads=2,
                          layers=1)
        model = make_model(cfg)
        params = init_params(model, jax.random.key(0), max_seq_len=8)
        stats = transfer_stats(model, params, ds, num_classes=2,
                               max_batches=1)
        assert stats["transfer_sequences"] == 8.0  # 4 rows x 2 classes
        assert 0.0 <= stats["termination_rate"] <= 1.0
        assert 0.0 <= stats["pitch_js_to_target_class"] <= np.log(2) + 1e-9
        assert stats["mean_generated_len"] >= 0.0
