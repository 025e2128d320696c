"""CLI surface tests: flag parity with the reference (config.py:19-70) and
the evaluation CLI."""

from musicstyletransfer_tpu.cli.flags import get_config


class TestFlagParity:
    REFERENCE_FLAGS = [
        "--e-n-layers", "2", "--e-rnn-hidden-dim", "256",
        "--e-emb-hidden-dim", "256", "--e-dropout", "0.2",
        "--e-num-heads", "8", "--latent-dim", "256",
        "--d-n-layers", "1", "--d-rnn-hidden-dim", "128", "--d-dropout", "0.2",
        "--batch-size", "32", "--max-seq-len", "64",
        "--slices-per-quarter-note", "4", "--data", "d",
        "--validation-data", "v", "--minimum-pattern-length", "16",
        "--pattern-identifier", "recurring",
        "--epochs", "10000", "--learning-rate", "0.0003",
        "--optimizer", "adam", "--optimizer-params", "clip_gradient:1.0",
        "--validation-split", "0.0", "--kl-loss", "1.0",
        "--label-smoothing", "0.0", "--negative-label-downscaling",
        "--beam-size", "5", "--sampling-type", "sampling",
        "--load-checkpoint", "1", "--checkpoint-frequency", "1000",
        "--sampling-frequency", "2000", "--num-checkpoints-not-improved", "32",
        "--out-samples", "o", "--model-output", "m", "--checkpoint", "-1",
        "--gpu", "--toy", "--visualize-samples", "--verbose",
    ]

    def test_every_reference_flag_parses(self):
        args = get_config(self.REFERENCE_FLAGS)
        assert args.e_rnn_hidden_dim == 256
        assert args.optimizer_params == "clip_gradient:1.0"
        assert args.num_checkpoints_not_improved == 32
        assert args.gpu and args.toy and args.visualize_samples

    def test_unknown_flags_tolerated(self):
        # parse_known_args semantics (reference: config.py:73-75)
        args = get_config(["--batch-size", "4", "--some-future-flag", "x"])
        assert args.batch_size == 4

    def test_short_flags(self):
        args = get_config(["-o", "out", "-m", "models", "-c", "7"])
        assert args.out_samples == "out"
        assert args.model_output == "models"
        assert args.checkpoint == 7


class TestEvaluateCLI:
    def test_metrics_json_over_corpus(self, corpus_path, capsys, tmp_path):
        """mst-eval on the shipped checkpoint: one JSON line, sane values,
        batch-size invariant (wrap-row masking)."""
        import json
        import os

        import pytest

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pretrained = os.path.join(repo, "models", "guitar_bass")
        if not os.path.isdir(pretrained):
            pytest.skip("pretrained checkpoint not present")
        from musicstyletransfer_tpu.cli.evaluate import main

        def run(bs):
            main(["--model-output", pretrained, "--data", corpus_path,
                  "--batch-size", str(bs), "--cpu"])
            return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

        a = run(32)
        assert 0.0 < a["acc"] <= 1.0 and a["ppl"] >= 1.0
        b = run(19)  # doesn't divide the corpus -> exercises wrap masking
        for k in a:
            assert abs(a[k] - b[k]) < 1e-3, (k, a[k], b[k])


class TestSampleCLIRequiredArgs:
    def test_missing_out_samples_is_a_clear_error(self):
        """cli.sample without --out-samples must exit with a usable message,
        not crash later in os.makedirs(None)."""
        import pytest

        from musicstyletransfer_tpu.cli import sample as sample_cli

        with pytest.raises(SystemExit, match="out-samples"):
            sample_cli.main(["--model-output", "/tmp/nope",
                             "--data", "/tmp/nope"])


class TestRingAttentionFlag:
    def test_ring_flag_reaches_both_stacks(self):
        """--ring-attention must set ring_attention AND sequence_sharding
        on both transformer configs (the SP activation layout is what the
        ring consumes)."""
        from musicstyletransfer_tpu.cli.flags import get_config
        from musicstyletransfer_tpu.cli.main import create_model_config

        class _Dataset:
            def num_tokens(self):
                return 293

            def num_classes(self):
                return 2

        for argv, want in ([["--ring-attention"], True], [[], False]):
            cfg = create_model_config(get_config(argv), _Dataset())
            for tc in (cfg.encoder_config.transformer_config,
                       cfg.decoder_config.transformer_config):
                assert tc.ring_attention is want
                assert tc.sequence_sharding is want
