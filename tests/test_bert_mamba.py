"""BERT encoder and Mamba SSM model tests against slow numpy oracles that
mirror the reference semantics (bert.rs:41-165, mamba.rs:103-220)."""

import numpy as np
import pytest

from llama_gguf_tpu.engine.engine import Engine, EngineConfig
from llama_gguf_tpu.gguf.writer import GGUFWriter


# -- synthetic builders --------------------------------------------------------

def build_bert_gguf(path, vocab=64, hidden=32, layers=2, heads=4, ffn=64,
                    ctx=32, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_metadata("general.architecture", "bert")
    w.add_metadata("general.name", "tiny-bert")
    w.add_metadata("bert.block_count", layers)
    w.add_metadata("bert.embedding_length", hidden)
    w.add_metadata("bert.attention.head_count", heads)
    w.add_metadata("bert.feed_forward_length", ffn)
    w.add_metadata("bert.context_length", ctx)
    w.add_metadata("bert.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata("tokenizer.ggml.model", "bert")
    w.add_metadata("tokenizer.ggml.tokens", [f"tok{i}" for i in range(vocab)])
    w.add_metadata("tokenizer.ggml.token_type", [1] * vocab)

    weights = {}

    def t(name, shape, offset=0.0):
        arr = rng.normal(size=shape).astype(np.float32) * 0.1 + offset
        w.add_tensor_np(name, arr)
        weights[name] = arr
        return arr

    t("token_embd.weight", (vocab, hidden))
    t("position_embd.weight", (ctx, hidden))
    t("token_types.weight", (2, hidden))
    t("token_embd_norm.weight", (hidden,), offset=1.0)
    t("token_embd_norm.bias", (hidden,))
    for i in range(layers):
        p = f"blk.{i}"
        for nm, shape, off in (
            (f"{p}.attn_q.weight", (hidden, hidden), 0.0),
            (f"{p}.attn_q.bias", (hidden,), 0.0),
            (f"{p}.attn_k.weight", (hidden, hidden), 0.0),
            (f"{p}.attn_k.bias", (hidden,), 0.0),
            (f"{p}.attn_v.weight", (hidden, hidden), 0.0),
            (f"{p}.attn_v.bias", (hidden,), 0.0),
            (f"{p}.attn_output.weight", (hidden, hidden), 0.0),
            (f"{p}.attn_output.bias", (hidden,), 0.0),
            (f"{p}.attn_output_norm.weight", (hidden,), 1.0),
            (f"{p}.attn_output_norm.bias", (hidden,), 0.0),
            (f"{p}.ffn_up.weight", (ffn, hidden), 0.0),
            (f"{p}.ffn_up.bias", (ffn,), 0.0),
            (f"{p}.ffn_down.weight", (hidden, ffn), 0.0),
            (f"{p}.ffn_down.bias", (hidden,), 0.0),
            (f"{p}.layer_output_norm.weight", (hidden,), 1.0),
            (f"{p}.layer_output_norm.bias", (hidden,), 0.0),
        ):
            t(nm, shape, offset=off)
    w.write_to_path(path)
    return weights


def build_mamba_gguf(path, vocab=64, hidden=32, layers=2, d_inner=64,
                     d_state=8, dt_rank=4, ks=4, ctx=64, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_metadata("general.architecture", "mamba")
    w.add_metadata("general.name", "tiny-mamba")
    w.add_metadata("mamba.block_count", layers)
    w.add_metadata("mamba.embedding_length", hidden)
    w.add_metadata("mamba.context_length", ctx)
    w.add_metadata("mamba.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata("mamba.ssm.inner_size", d_inner)
    w.add_metadata("mamba.ssm.state_size", d_state)
    w.add_metadata("mamba.ssm.time_step_rank", dt_rank)
    w.add_metadata("mamba.ssm.conv_kernel", ks)
    w.add_metadata("tokenizer.ggml.model", "gpt2")
    w.add_metadata("tokenizer.ggml.tokens", [f"tok{i}" for i in range(vocab)])
    w.add_metadata("tokenizer.ggml.token_type", [1] * vocab)
    w.add_metadata("tokenizer.ggml.merges", [])

    weights = {}

    def t(name, shape, scale=0.1, offset=0.0):
        arr = rng.normal(size=shape).astype(np.float32) * scale + offset
        w.add_tensor_np(name, arr)
        weights[name] = arr
        return arr

    t("token_embd.weight", (vocab, hidden))
    for i in range(layers):
        p = f"blk.{i}"
        t(f"{p}.attn_norm.weight", (hidden,), 0.02, offset=1.0)
        t(f"{p}.ssm_in.weight", (2 * d_inner, hidden))
        t(f"{p}.ssm_conv1d.weight", (d_inner, ks))
        t(f"{p}.ssm_conv1d.bias", (d_inner,))
        t(f"{p}.ssm_x.weight", (dt_rank + 2 * d_state, d_inner))
        t(f"{p}.ssm_dt.weight", (d_inner, dt_rank))
        t(f"{p}.ssm_dt.bias", (d_inner,))
        a = -np.exp(rng.normal(size=(d_inner, d_state)).astype(np.float32) * 0.5)
        w.add_tensor_np(f"{p}.ssm_a", a)
        weights[f"{p}.ssm_a"] = a
        t(f"{p}.ssm_d", (d_inner,))
        t(f"{p}.ssm_out.weight", (hidden, d_inner))
    t("output_norm.weight", (hidden,), 0.02, offset=1.0)
    t("output.weight", (vocab, hidden))
    w.write_to_path(path)
    return weights


# -- numpy oracles ---------------------------------------------------------------

def np_layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_bert_forward(weights, tokens, layers, heads):
    hidden = weights["token_embd.weight"].shape[1]
    hd = hidden // heads
    t = len(tokens)
    x = (weights["token_embd.weight"][tokens]
         + weights["position_embd.weight"][:t]
         + weights["token_types.weight"][0])
    x = np_layer_norm(x, weights["token_embd_norm.weight"],
                      weights["token_embd_norm.bias"])
    for i in range(layers):
        p = f"blk.{i}"
        h = np_layer_norm(x, weights[f"{p}.attn_output_norm.weight"],
                          weights[f"{p}.attn_output_norm.bias"])
        q = h @ weights[f"{p}.attn_q.weight"].T + weights[f"{p}.attn_q.bias"]
        k = h @ weights[f"{p}.attn_k.weight"].T + weights[f"{p}.attn_k.bias"]
        v = h @ weights[f"{p}.attn_v.weight"].T + weights[f"{p}.attn_v.bias"]
        out = np.zeros_like(q)
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            s = q[:, sl] @ k[:, sl].T / np.sqrt(hd)
            s = np.exp(s - s.max(-1, keepdims=True))
            s /= s.sum(-1, keepdims=True)
            out[:, sl] = s @ v[:, sl]
        x = x + out @ weights[f"{p}.attn_output.weight"].T + \
            weights[f"{p}.attn_output.bias"]
        h2 = np_layer_norm(x, weights[f"{p}.layer_output_norm.weight"],
                           weights[f"{p}.layer_output_norm.bias"])
        up = h2 @ weights[f"{p}.ffn_up.weight"].T + weights[f"{p}.ffn_up.bias"]
        act = 0.5 * up * (1 + np.tanh(0.7978845608 * (up + 0.044715 * up**3)))
        x = x + act @ weights[f"{p}.ffn_down.weight"].T + \
            weights[f"{p}.ffn_down.bias"]
    return x


def np_mamba_forward(weights, tokens, layers, d_inner, d_state, dt_rank, ks):
    """Per-token recurrence exactly as the reference (mamba.rs:103-220)."""
    emb = weights["token_embd.weight"]
    hidden = emb.shape[1]
    x_seq = emb[tokens]
    conv_state = [np.zeros((ks - 1, d_inner), np.float32) for _ in range(layers)]
    ssm_state = [np.zeros((d_inner, d_state), np.float32) for _ in range(layers)]

    def silu(v):
        return v / (1 + np.exp(-v))

    outs = []
    for tok_x in x_seq:
        x = tok_x.copy()
        for i in range(layers):
            p = f"blk.{i}"
            wn = weights[f"{p}.attn_norm.weight"]
            h = x / np.sqrt((x * x).mean() + 1e-5) * wn
            proj = h @ weights[f"{p}.ssm_in.weight"].T
            xs_raw, z = proj[:d_inner], proj[d_inner:]
            cw = weights[f"{p}.ssm_conv1d.weight"]  # [d_inner, ks]
            window = np.concatenate([conv_state[i], xs_raw[None]], 0)  # [ks, di]
            conv = (window * cw.T).sum(0) + weights[f"{p}.ssm_conv1d.bias"]
            conv_state[i] = window[1:]
            xs = silu(conv)
            x_db = xs @ weights[f"{p}.ssm_x.weight"].T
            dt_raw = x_db[:dt_rank]
            b = x_db[dt_rank:dt_rank + d_state]
            c = x_db[dt_rank + d_state:]
            dt = np.logaddexp(0, dt_raw @ weights[f"{p}.ssm_dt.weight"].T
                              + weights[f"{p}.ssm_dt.bias"])
            a = weights[f"{p}.ssm_a"]
            decay = np.exp(a * dt[:, None])
            ssm_state[i] = decay * ssm_state[i] + \
                b[None, :] * (dt * xs)[:, None]
            y = (ssm_state[i] * c[None, :]).sum(-1)
            y = y + weights[f"{p}.ssm_d"] * xs
            y = y * silu(z)
            x = x + y @ weights[f"{p}.ssm_out.weight"].T
        outs.append(x)
    x = np.stack(outs)
    xn = x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-5) * \
        weights["output_norm.weight"]
    return xn @ weights["output.weight"].T


# -- tests -------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bert_setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bert") / "bert.gguf")
    weights = build_bert_gguf(path)
    return path, weights


@pytest.fixture(scope="module")
def mamba_setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mamba") / "mamba.gguf")
    weights = build_mamba_gguf(path)
    return path, weights


def test_bert_matches_numpy_oracle(bert_setup):
    path, weights = bert_setup
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    assert eng.encoder is not None
    tokens = [3, 17, 42, 5]
    got = eng.encoder.encode([tokens])[0, : len(tokens)]
    want = np_bert_forward(weights, tokens, layers=2, heads=4)
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_bert_embed_pipeline(bert_setup):
    path, _ = bert_setup
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    v = eng.embed("tok3 tok5", pooling="mean")
    assert v.shape == (32,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    with pytest.raises(RuntimeError, match="encoder-only"):
        eng.generate("hi", max_tokens=2)


def test_bert_batched_encode_padding(bert_setup):
    """Padding rows must not change a sequence's encoding."""
    path, _ = bert_setup
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    single = eng.encoder.encode([[1, 2, 3]])[0, :3]
    batched = eng.encoder.encode([[1, 2, 3], [9, 8, 7, 6, 5]])[0, :3]
    assert np.allclose(single, batched, atol=1e-5)


def test_mamba_matches_numpy_oracle(mamba_setup):
    path, weights = mamba_setup
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    assert eng.runner.cfg.layer_kinds == ("mamba", "mamba")
    tokens = [3, 17, 42, 5, 11]
    kv = eng.runner.init_kv()
    logits, kv, pos = eng.runner.prefill(tokens, kv)
    want = np_mamba_forward(weights, tokens, layers=2, d_inner=64,
                            d_state=8, dt_rank=4, ks=4)
    got = np.asarray(logits)
    assert np.allclose(got, want[-1], atol=3e-4), np.abs(got - want[-1]).max()


def test_mamba_prefill_matches_stepwise(mamba_setup):
    """Batched-prefill recurrence == one-token-at-a-time decode."""
    path, _ = mamba_setup
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    tokens = [3, 17, 42, 5, 11, 7]
    kv = eng.runner.init_kv()
    logits_pf, _, _ = eng.runner.prefill(tokens, kv)

    kv2 = eng.runner.init_kv()
    logits_step, kv2, _ = eng.runner.prefill(tokens[:1], kv2)
    for i, tok in enumerate(tokens[1:]):
        logits_step, kv2 = eng.runner.decode_one(tok, i + 1, kv2)
    # tolerance covers matmul-tiling rounding between [T,K] and [1,K] passes
    assert np.allclose(np.asarray(logits_pf), np.asarray(logits_step),
                       atol=2e-3)


def test_mamba_padding_does_not_pollute_state(mamba_setup):
    """Prefill pads to a bucket (6 tokens -> bucket 8); the padded slots
    must not advance the conv/SSM state, so continuing with decode matches
    the numpy oracle run over the full 7-token sequence."""
    path, weights = mamba_setup
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    tokens = [3, 17, 42, 5, 11, 7]  # 6 tokens: 2 padded slots in the bucket
    kv = eng.runner.init_kv()
    _, kv, pos = eng.runner.prefill(tokens, kv)
    logits, kv = eng.runner.decode_one(9, pos, kv)
    want = np_mamba_forward(weights, tokens + [9], layers=2, d_inner=64,
                            d_state=8, dt_rank=4, ks=4)
    assert np.allclose(np.asarray(logits), want[-1], atol=2e-3), \
        np.abs(np.asarray(logits) - want[-1]).max()


def test_mamba_generation_runs(mamba_setup):
    path, _ = mamba_setup
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    ids = eng.tokenizer.encode("tok1 tok2")
    out = eng.greedy_tokens(ids, 8)
    out2 = eng.greedy_tokens(ids, 8)
    assert out == out2 and len(out) >= 1
