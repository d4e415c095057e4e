"""CLI flag surface + C-API-shaped embedding interface."""
import pytest

from ntransformer_tpu import api
from ntransformer_tpu.cli import build_parser, main
from tools.make_test_gguf import write_model


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=6)
    return str(path)


def test_parser_reference_flags():
    """Every reference flag (main.cpp:10-30) parses."""
    p = build_parser()
    args = p.parse_args([
        "-m", "m.gguf", "-p", "hi", "-n", "32", "-t", "0.5", "--top-k", "20",
        "--top-p", "0.9", "--repeat-penalty", "1.2", "-c", "2048", "--seed",
        "7", "--streaming", "--draft-model", "d.gguf", "--draft-k", "5",
        "--self-spec", "--early-exit", "0.99", "--skip-threshold", "0.98",
        "--requant-q4k", "--benchmark", "-v"])
    assert args.model == "m.gguf" and args.draft_k == 5
    assert args.skip_threshold == 0.98 and args.streaming


def test_cli_generate(tiny_gguf, capsys):
    rc = main(["-m", tiny_gguf, "-p", "hello", "-n", "4", "-t", "0"])
    assert rc == 0
    assert "decode:" in capsys.readouterr().err


def test_cli_tiered_benchmark(tiny_gguf, capsys, monkeypatch):
    monkeypatch.setenv("NT_MAX_HBM_LAYERS", "1")
    rc = main(["-m", tiny_gguf, "--streaming", "--benchmark",
               "--bench-tokens", "4", "--max-hbm-layers", "1"])
    assert rc == 0
    assert "decode:" in capsys.readouterr().err


def test_cli_delta_refused(tiny_gguf):
    assert main(["-m", tiny_gguf, "--delta-model", "x.ntd"]) == 2


def test_c_api_roundtrip(tiny_gguf):
    h = api.nt_engine_create()
    assert api.nt_engine_load(h, tiny_gguf, max_ctx=256) == api.NT_OK
    assert api.nt_engine_vocab_size(h) == 512
    assert api.nt_engine_n_layers(h) == 4
    assert api.nt_engine_hidden_size(h) == 256
    text = api.nt_engine_generate(h, "hi", max_tokens=3, temperature=0.0)
    assert isinstance(text, str)
    assert api.nt_engine_destroy(h) == api.NT_OK


def test_c_api_bad_handle():
    assert api.nt_engine_load(99999, "nope.gguf") == api.NT_ERROR
    assert api.nt_engine_generate(99999, "hi") is None
    assert api.nt_engine_vocab_size(99999) == api.NT_ERROR


def test_cli_serve_mode(tiny_gguf, tmp_path, capsys):
    pf = tmp_path / "prompts.txt"
    pf.write_text("hello\nworld\nfoo bar\n")
    rc = main(["-m", tiny_gguf, "--serve", str(pf), "--batch-size", "2",
               "-n", "4", "-t", "0"])
    assert rc == 0
    out = capsys.readouterr()
    assert out.out.count("###") == 3
    assert "served 3 requests" in out.err


def test_cli_serve_sharded(tiny_gguf, tmp_path, capsys):
    """--serve --dp/--tp builds the mesh server (north-star integration)."""
    pf = tmp_path / "prompts.txt"
    pf.write_text("hello\nworld\n")
    rc = main(["-m", tiny_gguf, "--serve", str(pf), "--batch-size", "4",
               "--dp", "4", "--tp", "2", "-n", "4", "-t", "0"])
    assert rc == 0
    out = capsys.readouterr()
    assert out.out.count("###") == 2
    assert "served 2 requests" in out.err


def test_cli_rejects_dead_flag_combos(tiny_gguf):
    """Flags that previously dropped silently now fail loudly: --dp
    without --serve, and --draft-model under --tp/--cp."""
    assert main(["-m", tiny_gguf, "--dp", "2", "-p", "x"]) == 2
    assert main(["-m", tiny_gguf, "--draft-model", tiny_gguf,
                 "--tp", "2", "-p", "x"]) == 2
    assert main(["-m", tiny_gguf, "--draft-model", tiny_gguf,
                 "--cp", "2", "-p", "x"]) == 2
    assert main(["-m", tiny_gguf, "--serve", "/dev/null", "--cp", "2"]) == 2
    # --serve is the resident continuous-batching loop; the single-request
    # engine modes don't compose with it
    assert main(["-m", tiny_gguf, "--serve", "/dev/null",
                 "--draft-model", tiny_gguf]) == 2
    assert main(["-m", tiny_gguf, "--serve", "/dev/null", "--self-spec"]) == 2
    assert main(["-m", tiny_gguf, "--serve", "/dev/null", "--streaming"]) == 2
    # --cp is a resident long-context mode; it can't shard streamed layers
    assert main(["-m", tiny_gguf, "--streaming", "--cp", "2", "-p", "x"]) == 2
    # --http is the live server: same composition rules as --serve, and
    # mutually exclusive with the file-replay mode
    assert main(["-m", tiny_gguf, "--serve", "/dev/null", "--http", "0"]) == 2
    assert main(["-m", tiny_gguf, "--http", "0", "--cp", "2"]) == 2
    assert main(["-m", tiny_gguf, "--http", "0", "--streaming"]) == 2


def test_cli_streaming_over_tp(tiny_gguf, capsys, monkeypatch):
    """--streaming --tp N: tiered streaming over a TP mesh end-to-end."""
    monkeypatch.setenv("NT_MAX_HBM_LAYERS", "1")
    rc = main(["-m", tiny_gguf, "--streaming", "--tp", "2",
               "--max-hbm-layers", "1", "-p", "hello", "-n", "3", "-t", "0"])
    assert rc == 0
    assert "decode:" in capsys.readouterr().err
