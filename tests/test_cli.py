"""CLI + config tests: every subcommand parses; info/quantize/run/bench/
embed/init-config/manpages run end-to-end on synthetic models."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_tiny_model
from llama_gguf_tpu.cli import build_parser, main
from llama_gguf_tpu.config import Config, example_config


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    return path


# -- config ---------------------------------------------------------------------

def test_config_defaults():
    cfg = Config()
    assert cfg.server.port == 8080 and cfg.generation.top_k == 40


def test_config_toml_and_env(tmp_path, monkeypatch):
    p = tmp_path / "c.toml"
    p.write_text("[server]\nport = 9999\n[generation]\ntemperature = 0.1\n")
    cfg = Config.load(str(p), apply_env=False)
    assert cfg.server.port == 9999 and cfg.generation.temperature == 0.1
    monkeypatch.setenv("LLAMA_GGUF_SERVER_PORT", "7777")
    monkeypatch.setenv("LLAMA_GGUF_GENERATION_STOP", "a,b")
    cfg2 = Config.load(str(p))
    assert cfg2.server.port == 7777  # env beats TOML
    assert cfg2.generation.stop == ["a", "b"]


def test_example_config_parses(tmp_path):
    import tomllib

    data = tomllib.loads(example_config())
    assert "server" in data and "model" in data
    p = tmp_path / "ex.toml"
    p.write_text(example_config())
    Config.load(str(p), apply_env=False)


def test_config_missing_file():
    with pytest.raises(FileNotFoundError):
        Config.load("/nonexistent/config.toml")


# -- parser ----------------------------------------------------------------------

def test_all_subcommands_parse():
    ap = build_parser()
    for argv in (
        ["info", "m.gguf"],
        ["run", "m.gguf", "-p", "hi", "-n", "8"],
        ["chat", "m.gguf", "--system", "s"],
        ["serve", "m.gguf", "--port", "9"],
        ["quantize", "a.gguf", "b.gguf", "-t", "q6_k"],
        ["sysinfo"],
        ["bench", "m.gguf", "--gen-tokens", "4"],
        ["embed", "m.gguf", "-p", "x"],
        ["download", "org/repo", "--list"],
        ["models"],
        ["rag", "ingest", "--db", "x.db", "file.txt"],
        ["rag", "search", "--db", "x.db", "q"],
        ["init-config", "x.toml"],
        ["manpages", "--dir", "man"],
    ):
        args = ap.parse_args(argv)
        assert args.command == argv[0]


# -- end-to-end subcommands (in-process) -----------------------------------------

def test_cmd_info(model_path, capsys):
    assert main(["info", model_path]) == 0
    out = capsys.readouterr().out
    assert "qwen2" in out and "tensors" in out


def test_cmd_info_json(model_path, capsys):
    assert main(["info", model_path, "--json"]) == 0
    d = json.loads(capsys.readouterr().out)
    assert d["tensor_count"] > 0 and d["metadata"]["general.architecture"] == "qwen2"


def test_cmd_run(model_path, capsys):
    rc = main(["run", model_path, "-p", "hello", "-n", "4",
               "-t", "0", "--weight-mode", "dequant", "--no-stream"])
    assert rc == 0
    # synthetic model may emit empty/EOG text; the stats line proves the
    # prefill+decode loop ran
    assert "prefill" in capsys.readouterr().err


def test_cmd_quantize_roundtrip(model_path, tmp_path, capsys):
    out = str(tmp_path / "q8.gguf")
    assert main(["quantize", model_path, out, "-t", "q8_0"]) == 0
    from llama_gguf_tpu.gguf.reader import GGUFFile

    g = GGUFFile.open(out)
    types = {i.ggml_type.name for i in g.tensors.values()}
    assert "Q8_0" in types
    assert g.metadata["general.architecture"] == "qwen2"
    g.close()
    # quantized model still loads and runs
    rc = main(["run", out, "-p", "hi", "-n", "2", "-t", "0",
               "--weight-mode", "dequant", "--no-stream"])
    assert rc == 0


def test_cmd_sysinfo(capsys):
    assert main(["sysinfo"]) == 0
    out = capsys.readouterr().out
    assert "devices:" in out


def test_cmd_bench(model_path, capsys):
    rc = main(["bench", model_path, "--prompt-tokens", "8",
               "--gen-tokens", "4", "--weight-mode", "dequant", "--json"])
    assert rc == 0
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["decode_tps"] > 0


def test_cmd_embed(model_path, capsys):
    rc = main(["embed", model_path, "-p", "hello", "-p", "world",
               "--weight-mode", "dequant", "--json"])
    assert rc == 0
    vecs = json.loads(capsys.readouterr().out)
    assert len(vecs) == 2 and len(vecs[0]) == 64
    n = np.linalg.norm(vecs[0])
    assert abs(n - 1.0) < 1e-4  # normalized


def test_cmd_init_config_and_manpages(tmp_path, capsys):
    cfg_path = str(tmp_path / "new.toml")
    assert main(["init-config", cfg_path]) == 0
    assert os.path.exists(cfg_path)
    man_dir = str(tmp_path / "man")
    assert main(["manpages", "--dir", man_dir]) == 0
    pages = os.listdir(os.path.join(man_dir, "man1"))
    assert "llama-gguf-tpu.1" in pages
    assert any("quantize" in p for p in pages)
    content = open(os.path.join(man_dir, "man1", "llama-gguf-tpu.1")).read()
    assert ".TH" in content and ".SH NAME" in content


def test_cmd_models_empty(tmp_path, capsys):
    assert main(["models", "--dir", str(tmp_path / "nocache")]) == 0


def test_python_m_entrypoint(model_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "llama_gguf_tpu", "info", model_path],
        capture_output=True, text=True, timeout=120, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
    assert "qwen2" in r.stdout


def test_cmd_run_self_speculative(model_path, capsys):
    rc = main(["run", model_path, "-p", "hi there", "-n", "8", "-t", "0",
               "--weight-mode", "dequant", "--self-speculative", "1",
               "--num-draft", "3"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "speculative" in err and "acceptance" in err


def test_cmd_perplexity(model_path, tmp_path, capsys):
    f = tmp_path / "text.txt"
    f.write_text("tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8 " * 4)
    rc = main(["perplexity", model_path, "-f", str(f), "--chunk", "16",
               "--weight-mode", "dequant", "--json"])
    assert rc == 0
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["ppl"] > 1.0 and d["tokens"] > 0


def test_perplexity_matches_manual(model_path):
    """Chunked device NLL == manual numpy log-softmax computation."""
    import jax.numpy as jnp
    from llama_gguf_tpu.engine.engine import Engine, EngineConfig
    from llama_gguf_tpu.engine.perplexity import perplexity

    eng = Engine.load(model_path, EngineConfig(weight_mode="dequant"))
    ids = eng.tokenizer.encode("tok1 tok2 tok3 tok4 tok5 tok6")
    res = perplexity(eng.runner, ids, chunk=len(ids))

    kv = eng.runner.init_kv()
    t = len(ids)
    logits, _ = eng.runner.step(
        jnp.asarray([ids], jnp.int32),
        jnp.asarray([list(range(t))], jnp.int32),
        jnp.asarray([t], jnp.int32), kv)
    lg = np.asarray(logits[0], np.float64)
    lse = np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1)) + \
        lg.max(-1, keepdims=True)[:, 0]
    nll = -(lg[np.arange(t - 1), ids[1:]] - lse[: t - 1]).sum()
    assert res.nll_sum == pytest.approx(nll, rel=1e-4)


def test_parity_runbook_harness(tmp_path, monkeypatch):
    """scripts/parity_vs_llamacpp.py plumbing: with a stub 'llama.cpp'
    backend that mirrors our own engine, every gate passes and the verdict
    is PASS (no real llama.cpp exists in this environment; the runbook is
    for when a real model + llama.cpp are available)."""
    import importlib.util
    import sys as _sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_tiny_model

    spec = importlib.util.spec_from_file_location(
        "parity_vs_llamacpp",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "parity_vs_llamacpp.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    model = str(tmp_path / "tiny.gguf")
    make_tiny_model(model, arch="qwen2", vocab=260, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=128, tokenizer=True)
    engine = mod.load_ours(model, 128)

    prompt = "hello world"
    ours = mod.ours_greedy(engine, prompt, 8)
    assert len(ours) == 8

    class StubBackend:
        """Echoes our engine — validates the comparison plumbing."""
        def greedy(self, p, n):
            return mod.ours_greedy(engine, p, n)

        def last_logits(self, p):
            return mod.ours_last_logits(engine, p)

        def ppl(self, text_file, chunk):
            text = open(text_file).read()
            return mod.ours_ppl(engine, text, chunk)

    b = StubBackend()
    theirs = b.greedy(prompt, 8)
    assert theirs == ours  # token-exact greedy match

    lg_ours = mod.ours_last_logits(engine, prompt)
    lg_theirs = b.last_logits(prompt)
    diff = np.abs(lg_ours - lg_theirs).max()
    assert diff == 0.0

    ppl_file = tmp_path / "text.txt"
    ppl_file.write_text("the quick brown fox jumps over the lazy dog " * 20)
    our_ppl = mod.ours_ppl(engine, ppl_file.read_text(), 64)
    their_ppl = b.ppl(str(ppl_file), 64)
    assert abs(our_ppl - their_ppl) / their_ppl < 1e-6


def test_parity_runbook_main_end_to_end(tmp_path, capsys, monkeypatch):
    """The FULL runbook pipeline (main(): load -> greedy -> logits ->
    delta-ppl -> verdict JSON) runs end-to-end in --backend self mode on a
    synthetic GGUF and emits verdict PASS — keeps the harness alive until a
    real llama.cpp + real GGUF can replace the self backend."""
    import importlib.util
    import json as _json

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_tiny_model

    spec = importlib.util.spec_from_file_location(
        "parity_vs_llamacpp_e2e",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "parity_vs_llamacpp.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    model = str(tmp_path / "tiny.gguf")
    make_tiny_model(model, arch="qwen2", vocab=260, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=128, tokenizer=True)
    text = tmp_path / "ppl.txt"
    text.write_text("the quick brown fox jumps over the lazy dog " * 10)

    monkeypatch.setattr(sys, "argv", [
        "parity_vs_llamacpp.py", model, "--backend", "self",
        "-n", "8", "--ppl-text", str(text), "--ppl-chunk", "64",
        "--max-ctx", "128"])
    rc = mod.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    verdict = _json.loads(out)
    assert rc == 0
    assert verdict["verdict"] == "PASS"
    assert verdict["greedy_match"] is True
    assert verdict["argmax_match"] is True
    assert verdict["logits_max_abs_diff"] == 0.0
    assert verdict["ppl_gate"] is True
    assert verdict["delta_ppl_rel"] == 0.0


def test_cli_tokenize(tmp_path, capsys):
    from fixtures import make_tiny_model
    from llama_gguf_tpu.cli import main

    path = str(tmp_path / "m.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    assert main(["tokenize", path, "-p", "hello"]) == 0
    out = capsys.readouterr().out
    assert "total:" in out and "->" in out
    assert main(["tokenize", path, "--ids", "5,9"]) == 0
