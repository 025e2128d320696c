"""Micro-batched style-transfer service tests."""

import os

import jax
import numpy as np
import pytest

from musicstyletransfer_tpu.midi import smf
from musicstyletransfer_tpu.midi.codec import Melody, MelodyWriter
from musicstyletransfer_tpu.midi.vocab import note_on_id, timeshift_id
from tests.test_model import tiny_config


@pytest.fixture(scope="module")
def model_folder(tmp_path_factory):
    from musicstyletransfer_tpu.models import init_params, make_model
    from musicstyletransfer_tpu.training import (
        OptimizerConfig,
        build_optimizer,
        create_train_state,
        save_checkpoint,
    )

    folder = str(tmp_path_factory.mktemp("svc-model"))
    cfg = tiny_config(vocab=293, classes=3, latent=8, size=16, heads=2,
                      layers=1)
    cfg.save(os.path.join(folder, "config"))
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0), max_seq_len=8)
    tx = build_optimizer(OptimizerConfig("adam", "", 1e-3))
    save_checkpoint(folder, 1, create_train_state(params, tx, jax.random.key(0)))
    return folder


def _midi_bytes(pitches=(60, 62, 64)):
    tokens = []
    for p in pitches:
        tokens += [note_on_id(p), timeshift_id(120), note_on_id(p)]
    melody = Melody(tokens=np.asarray(tokens, np.int32))
    return smf.dump_midifile(MelodyWriter().to_midifile(melody))


class TestService:
    def test_submit_midi(self, model_folder):
        from musicstyletransfer_tpu.inference.service import StyleTransferService

        svc = StyleTransferService(model_folder, checkpoint=-1, batch_size=4,
                                   max_seq_len=8)
        result = svc.submit_midi(_midi_bytes())
        assert set(result.midi_by_class) == {0, 1, 2}
        for c, midi in result.midi_by_class.items():
            mf = smf.parse_midifile(midi)  # valid SMF out
            assert mf.resolution > 0

    def test_micro_batch_partial_fill(self, model_folder):
        from musicstyletransfer_tpu.inference.service import StyleTransferService

        svc = StyleTransferService(model_folder, checkpoint=-1, batch_size=4,
                                   max_seq_len=8)
        toks = [svc._tokens_from_midi(_midi_bytes((60 + i,))) for i in range(2)]
        results = svc.transfer_tokens(toks)
        assert len(results) == 2  # padding rows dropped

    def test_threaded_loop(self, model_folder):
        from musicstyletransfer_tpu.inference.service import StyleTransferService

        svc = StyleTransferService(model_folder, checkpoint=-1, batch_size=4,
                                   max_seq_len=8, max_wait_ms=20)
        svc.start()
        got = []
        try:
            for i in range(3):
                svc.enqueue(_midi_bytes((60 + i,)), got.append)
            deadline = __import__("time").time() + 60
            while len(got) < 3 and __import__("time").time() < deadline:
                __import__("time").sleep(0.05)
        finally:
            svc.stop()
        assert len(got) == 3
        assert all(set(r.midi_by_class) == {0, 1, 2} for r in got)

    def test_mesh_sharded_service(self, model_folder, cpu_devices):
        """mesh= serves the micro-batch sharded over the data axis."""
        from musicstyletransfer_tpu.inference.service import StyleTransferService
        from musicstyletransfer_tpu.parallel import make_mesh

        mesh = make_mesh(cpu_devices[:8], tp=1)
        svc = StyleTransferService(model_folder, checkpoint=-1, batch_size=4,
                                   max_seq_len=8, mesh=mesh)
        result = svc.submit_midi(_midi_bytes())
        assert set(result.midi_by_class) == {0, 1, 2}
        for midi in result.midi_by_class.values():
            assert smf.parse_midifile(midi).resolution > 0

    def test_concurrent_producers_stress(self, model_folder):
        """Many threads enqueueing at once: every request must be served
        exactly once and callbacks must fire from the service thread
        without loss under contention."""
        import threading

        from musicstyletransfer_tpu.inference.service import StyleTransferService

        svc = StyleTransferService(model_folder, checkpoint=-1, batch_size=4,
                                   max_seq_len=8, max_wait_ms=5)
        svc.start()
        got = []
        lock = threading.Lock()

        def record(result):
            with lock:
                got.append(result)

        def producer(base):
            for i in range(4):
                svc.enqueue(_midi_bytes((60 + (base + i) % 24,)), record)

        try:
            threads = [threading.Thread(target=producer, args=(t * 4,))
                       for t in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            deadline = __import__("time").time() + 120
            while len(got) < 16 and __import__("time").time() < deadline:
                __import__("time").sleep(0.05)
        finally:
            svc.stop()
        assert len(got) == 16
        assert all(set(r.midi_by_class) == {0, 1, 2} for r in got)

    def test_rejects_empty_midi(self, model_folder):
        from musicstyletransfer_tpu.inference.service import StyleTransferService

        svc = StyleTransferService(model_folder, checkpoint=-1, batch_size=2,
                                   max_seq_len=8)
        track = [smf.SetTempo.from_bpm(120.0), smf.EndOfTrack(tick=1)]
        empty = smf.dump_midifile(
            smf.MidiFile(format=1, resolution=220, tracks=[track])
        )
        with pytest.raises(ValueError, match="no note events"):
            svc.submit_midi(empty)


class TestServiceStats:
    def test_stats_snapshot_counts_and_latency(self, model_folder):
        from musicstyletransfer_tpu.inference.service import StyleTransferService

        svc = StyleTransferService(model_folder, checkpoint=-1, batch_size=4,
                                   max_seq_len=8, max_wait_ms=20)
        svc.start()
        got = []
        try:
            for i in range(5):
                svc.enqueue(_midi_bytes((60 + i,)), got.append)
            deadline = __import__("time").time() + 60
            while len(got) < 5 and __import__("time").time() < deadline:
                __import__("time").sleep(0.05)
        finally:
            svc.stop()
        s = svc.stats.snapshot()
        assert s["requests_served"] == 5
        assert s["batches"] >= 2  # batch_size 4 can't fit 5 in one
        assert 0 < s["latency_p50_ms"] <= s["latency_p99_ms"]
        assert s["latency_p99_ms"] <= s["latency_max_ms"]
        assert 0 < s["mean_batch_fill"] <= 4

    def test_percentile_nearest_rank(self):
        """Nearest-rank = 1-based ceil(p*N/100): p50 of 1..100 is 50, p99
        is 99 — NOT the max (the original 0-based int() index was one rank
        high whenever p*N/100 was integral)."""
        from musicstyletransfer_tpu.inference.service import _percentile

        vals = sorted(float(i) for i in range(1, 101))
        assert _percentile(vals, 50) == 50.0
        assert _percentile(vals, 99) == 99.0
        assert _percentile(vals, 100) == 100.0
        assert _percentile([], 50) == 0.0
        assert _percentile([7.0], 99) == 7.0


class TestServiceBuckets:
    def test_bucket_pick_and_shapes(self, model_folder):
        from musicstyletransfer_tpu.inference.service import StyleTransferService

        svc = StyleTransferService(model_folder, checkpoint=-1, batch_size=4,
                                   max_seq_len=8, buckets=[4, 8])
        short = svc._tokens_from_midi(_midi_bytes((60,)))[:3]
        long = svc._tokens_from_midi(_midi_bytes((60, 62, 64)))[:8]
        assert svc._pick_bucket([short]) == 4
        assert svc._pick_bucket([short, long]) == 8
        # Short-only batch decodes at the small bucket's budget.
        r_short = svc.transfer_tokens([short])
        r_long = svc.transfer_tokens([long])
        assert len(r_short) == 1 and len(r_long) == 1
        for r in (r_short[0], r_long[0]):
            assert set(r.midi_by_class) == {0, 1, 2}
        short_len = max(
            len(t) for t in r_short[0].tokens_by_class.values()
        )
        assert short_len <= 2 * (4 + 1)  # small-bucket generation cap

    def test_bucket_validation(self, model_folder):
        from musicstyletransfer_tpu.inference.service import StyleTransferService

        with pytest.raises(ValueError):
            StyleTransferService(model_folder, checkpoint=-1, batch_size=2,
                                 max_seq_len=8, buckets=[4, 16])


class TestServeCLI:
    def test_one_shot_with_buckets_and_stats(self, model_folder, tmp_path,
                                             capsys):
        from musicstyletransfer_tpu.cli import serve

        in_dir = tmp_path / "in"
        out_dir = tmp_path / "out"
        in_dir.mkdir()
        for i in range(3):
            (in_dir / f"req{i}.mid").write_bytes(_midi_bytes((60 + i,)))
        serve.main([
            "--model-output", model_folder, "--checkpoint", "-1",
            "--in-dir", str(in_dir), "--out-samples", str(out_dir),
            "--batch-size", "4", "--max-seq-len", "8",
            "--buckets", "4,8", "--stats", "--cpu",
        ])
        outs = sorted(p.name for p in out_dir.iterdir())
        # 3 inputs x 3 classes
        assert len(outs) == 9, outs
        assert "req0.class-0.mid" in outs
        captured = capsys.readouterr().out
        assert "stats: served=3" in captured
        assert "p99=" in captured


class TestHTTPServing:
    """--http endpoint: concurrent POSTs micro-batch through the service."""

    @pytest.fixture()
    def http_server(self, model_folder):
        import threading

        from musicstyletransfer_tpu.cli.serve import serve_http
        from musicstyletransfer_tpu.inference.service import (
            StyleTransferService,
        )

        # Generous coalescing window: the micro-batching assertion below
        # must hold even on a slow 1-vCPU host.
        svc = StyleTransferService(model_folder, checkpoint=-1, batch_size=4,
                                   max_seq_len=8, max_wait_ms=200)
        server = serve_http(svc, "127.0.0.1", 0)  # ephemeral port
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{server.server_port}", svc
        server.shutdown()
        server.server_close()
        svc.stop()

    def test_transfer_json_and_raw(self, http_server):
        import base64
        import json
        import urllib.request

        http_server, _svc = http_server
        body = _midi_bytes()
        req = urllib.request.Request(f"{http_server}/transfer", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            payload = json.loads(resp.read())
        assert set(payload) == {"0", "1", "2"}
        for midi_b64 in payload.values():
            mf = smf.parse_midifile(base64.b64decode(midi_b64))
            assert mf.resolution > 0

        req = urllib.request.Request(f"{http_server}/transfer?class=1",
                                     data=body, method="POST")
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "audio/midi"
            mf = smf.parse_midifile(resp.read())
            assert mf.resolution > 0

    def test_concurrent_posts_micro_batch(self, http_server):
        """Simultaneous clients share fused calls (stats show fill > 1)."""
        import json
        import threading
        import urllib.request

        http_server, svc = http_server
        errors = []

        def one(i):
            try:
                req = urllib.request.Request(
                    f"{http_server}/transfer?class=0",
                    data=_midi_bytes((60 + i,)), method="POST",
                )
                with urllib.request.urlopen(req, timeout=60) as resp:
                    assert resp.status == 200
            except Exception as exc:  # surfaced below
                errors.append(exc)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        with urllib.request.urlopen(f"{http_server}/stats",
                                    timeout=10) as resp:
            stats = json.loads(resp.read())
        assert stats["requests_served"] >= 4
        # The point of the feature: concurrent requests COALESCE into
        # shared fused calls (not one singleton batch each).
        assert stats["batches"] < stats["requests_served"]

    def test_bad_request_and_health(self, http_server):
        import urllib.error
        import urllib.request

        http_server, svc = http_server
        with urllib.request.urlopen(f"{http_server}/healthz",
                                    timeout=10) as resp:
            assert resp.read() == b"ok"
        req = urllib.request.Request(f"{http_server}/transfer",
                                     data=b"not midi", method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400
        # Invalid / blank class selectors 400 BEFORE paying a device call.
        for bad in ("?class=99", "?class=", "?class=x"):
            req = urllib.request.Request(f"{http_server}/transfer{bad}",
                                         data=_midi_bytes(), method="POST")
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(req, timeout=30)
            assert exc_info.value.code == 400, bad

    def test_failed_batch_fails_fast(self, http_server):
        # A device/loop error must 500 promptly via the exception
        # callback, not strand the client until the 120s timeout; the
        # loop itself must survive and keep serving.
        import time
        import urllib.error
        import urllib.request

        http_server, svc = http_server

        def boom(toks):
            raise RuntimeError("injected device failure")

        orig = svc._dispatch
        svc._dispatch = boom
        try:
            t0 = time.perf_counter()
            req = urllib.request.Request(f"{http_server}/transfer",
                                         data=_midi_bytes(), method="POST")
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(req, timeout=60)
            assert exc_info.value.code == 500
            assert time.perf_counter() - t0 < 30  # fail-fast, not 120s
            assert svc.stats.snapshot()["batch_errors"] >= 1
            assert svc.is_serving()  # the loop survived
        finally:
            svc._dispatch = orig

