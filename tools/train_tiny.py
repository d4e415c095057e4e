"""Train a small byte-level llama on this repository's own text, export it
through the repo's GGUF writer + quantizer, and produce REAL-WEIGHTS
evidence for the framework (r2 weak #10: every prior evaluation used
synthetic random weights — no generation had ever produced a sentence a
human could grade).

Everything stays inside the repo's own stack: the exported GGUF uses
core/gguf.GGUFWriter + core/quant.quantize, the byte vocab round-trips
through inference/tokenizer.py's SP byte-fallback path, and the trained
checkpoint is evaluated with tools/perplexity.py and Engine.generate.

The corpus is the repo's Python/Markdown sources (deterministic ordering,
~1.5 MB). The model is byte-level (vocab = 3 specials + 256 bytes, padded
to 384 so every matmul dim tiles the Pallas kernels: N%128==0), llama
shapes hidden=256 D=64 kv=2 inter=512 layers=6, tied embeddings.

Training runs in pure JAX/optax (AdamW, cosine decay), f32 params, with a
lax.scan over micro-steps per dispatch so the axon tunnel's per-call
latency doesn't gate it.

Run: python tools/train_tiny.py --out models/tinystories (defaults fine)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# model shapes (kernel-tileable: every N is a multiple of 128, K of 256)
VOCAB = 384          # 3 specials + 256 byte tokens + padding
HIDDEN = 256
N_LAYERS = 6
N_HEADS = 4
N_KV = 2
HEAD_DIM = HIDDEN // N_HEADS
INTER = 512
CTX = 512
ROPE_THETA = 10000.0
EPS = 1e-5
NAME = "repolm"  # output file stem (overridden by --name)

BOS, EOS = 1, 2
BYTE0 = 3  # token id of <0x00>


def build_corpus() -> bytes:
    """Deterministic concatenation of the repo's own sources."""
    paths = []
    for root, dirs, files in os.walk(REPO):
        dirs[:] = sorted(d for d in dirs
                         if d not in (".git", ".jax_cache", "__pycache__"))
        for f in sorted(files):
            if f.endswith((".py", ".md")):
                paths.append(os.path.join(root, f))
    chunks = []
    for p in paths:
        try:
            with open(p, "rb") as f:
                chunks.append(f.read())
        except OSError:
            continue
        chunks.append(b"\n\n")
    return b"".join(chunks)


def encode_bytes(data: bytes) -> np.ndarray:
    return np.frombuffer(data, np.uint8).astype(np.int32) + BYTE0


# --- training-side model (plain f32 pytree; mirrors models/llama.py math) ---

def init_params(seed: int):
    import jax
    import jax.numpy as jnp
    init = {}
    r = np.random.default_rng(seed)

    def mat(n, k, scale=None):
        scale = scale if scale is not None else (2.0 / (n + k)) ** 0.5
        return jnp.asarray(r.standard_normal((n, k)) * scale, jnp.float32)

    init["embed"] = mat(VOCAB, HIDDEN, 0.02)
    layers = []
    for _ in range(N_LAYERS):
        layers.append(dict(
            attn_norm=jnp.ones(HIDDEN, jnp.float32),
            wq=mat(HIDDEN, HIDDEN),
            wk=mat(N_KV * HEAD_DIM, HIDDEN),
            wv=mat(N_KV * HEAD_DIM, HIDDEN),
            wo=mat(HIDDEN, HIDDEN),
            ffn_norm=jnp.ones(HIDDEN, jnp.float32),
            w_gate=mat(INTER, HIDDEN),
            w_up=mat(INTER, HIDDEN),
            w_down=mat(HIDDEN, INTER),
        ))
    init["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    init["output_norm"] = jnp.ones(HIDDEN, jnp.float32)
    return init


def model_forward(params, tokens):
    """tokens [B, T] -> logits [B, T, V]. Same math as models/llama.py
    (rms_norm f32, non-interleaved rope, swiglu), batch-first for training."""
    import jax
    import jax.numpy as jnp

    B, T = tokens.shape

    def rms(x, w):
        var = jnp.mean(x * x, -1, keepdims=True)
        return x * jax.lax.rsqrt(var + EPS) * w

    x = params["embed"][tokens]                       # [B, T, H]
    d2 = HEAD_DIM // 2
    inv = 1.0 / (ROPE_THETA ** (jnp.arange(0, HEAD_DIM, 2) / HEAD_DIM))
    ang = jnp.outer(jnp.arange(T), inv)               # [T, d2]
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rope(v):  # [B, T, Hh, D]
        v0, v1 = v[..., :d2], v[..., d2:]
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        return jnp.concatenate([v0 * c - v1 * s, v0 * s + v1 * c], -1)

    mask = jnp.tril(jnp.ones((T, T), bool))

    def layer(x, lw):
        h = rms(x, lw["attn_norm"])
        q = (h @ lw["wq"].T).reshape(B, T, N_HEADS, HEAD_DIM)
        k = (h @ lw["wk"].T).reshape(B, T, N_KV, HEAD_DIM)
        v = (h @ lw["wv"].T).reshape(B, T, N_KV, HEAD_DIM)
        q, k = rope(q), rope(k)
        g = N_HEADS // N_KV
        qr = q.reshape(B, T, N_KV, g, HEAD_DIM)
        s = jnp.einsum("bthgd,bshd->bhgts", qr, k) / (HEAD_DIM ** 0.5)
        s = jnp.where(mask[None, None, None], s, -1e30)
        p = jax.nn.softmax(s, -1)
        o = jnp.einsum("bhgts,bshd->bthgd", p, v).reshape(B, T, HIDDEN)
        x = x + o @ lw["wo"].T
        h = rms(x, lw["ffn_norm"])
        gate = h @ lw["w_gate"].T
        up = h @ lw["w_up"].T
        x = x + (jax.nn.silu(gate) * up) @ lw["w_down"].T
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    x = rms(x, params["output_norm"])
    return x @ params["embed"].T                      # tied head


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "models"))
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--inner", type=int, default=50,
                    help="train steps per dispatch (lax.scan)")
    # shape overrides (r5: a hidden>=512 variant is W4A8-eligible —
    # K % 512 == 0 — so the quality gate can price w4a8 on LEARNED weights)
    global HIDDEN, INTER, N_LAYERS, N_HEADS, N_KV, HEAD_DIM, NAME
    ap.add_argument("--hidden", type=int, default=None)
    ap.add_argument("--inter", type=int, default=None)
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--heads", type=int, default=None)
    ap.add_argument("--kv", type=int, default=None)
    ap.add_argument("--name", default="repolm",
                    help="output file stem (<name>_q8.gguf, <name>_meta.json)")
    args = ap.parse_args()

    HIDDEN = args.hidden or HIDDEN
    INTER = args.inter or INTER
    N_LAYERS = args.layers or N_LAYERS
    N_HEADS = args.heads or N_HEADS
    N_KV = args.kv or N_KV
    HEAD_DIM = HIDDEN // N_HEADS
    NAME = args.name

    import jax
    import jax.numpy as jnp
    import optax

    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    data = build_corpus()
    ids = encode_bytes(data)
    n_val = 32 * 1024
    train_ids, val_ids = ids[:-n_val], ids[-n_val:]
    print(f"# corpus {len(data)/1e6:.2f} MB -> {len(train_ids)} train + "
          f"{len(val_ids)} val tokens", file=sys.stderr)

    params = init_params(0)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"# params {n_params/1e6:.2f}M", file=sys.stderr)

    warmup = min(100, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)

    train_dev = jnp.asarray(train_ids)

    def loss_fn(params, batch):
        logits = model_forward(params, batch[:, :-1])
        tgt = batch[:, 1:]
        ll = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(ll, tgt[..., None], -1)[..., 0]
        return nll.mean()

    def one_step(carry, rng_i):
        params, opt_state = carry
        starts = jax.random.randint(rng_i, (args.batch,), 0,
                                    len(train_ids) - CTX - 1)
        batch = jax.vmap(
            lambda s: jax.lax.dynamic_slice(train_dev, (s,), (CTX + 1,)))(starts)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run_chunk(params, opt_state, rng):
        rngs = jax.random.split(rng, args.inner)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), rngs)
        return params, opt_state, losses

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for step in range(0, args.steps, args.inner):
        rng, sub = jax.random.split(rng)
        params, opt_state, losses = run_chunk(params, opt_state, sub)
        lo = np.asarray(losses)
        print(f"# step {step + args.inner:5d}  loss {lo[-10:].mean():.4f}  "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr, flush=True)

    # held-out loss
    nv = (len(val_ids) - 1) // CTX
    vb = np.stack([val_ids[i*CTX: i*CTX + CTX + 1] for i in range(nv)])
    vl = float(np.mean([float(loss_fn(params, jnp.asarray(vb[i:i+8])))
                        for i in range(0, nv, 8)]))
    print(f"# val loss {vl:.4f} (ppl {np.exp(vl):.2f}, bits/byte "
          f"{vl/np.log(2):.3f})", file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    export(params, args.out, vl)


def byte_vocab():
    """GPT-2-style byte vocab: one proxy character per byte (token id =
    BYTE0 + byte). Byte-faithful in BOTH directions — the SP <0xXX> form
    would route spaces through the ▁ convention and triple-encode them."""
    from ntransformer_tpu.inference.tokenizer import gpt2_byte_to_unicode
    b2u = gpt2_byte_to_unicode()
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    scores = [0.0] * 3
    for b in range(256):
        tokens.append(b2u[b])
        types.append(1)
        scores.append(0.0)
    i = 0
    while len(tokens) < VOCAB:
        tokens.append(f"<pad{i}>")
        types.append(5)  # UNUSED
        scores.append(0.0)
        i += 1
    return tokens, scores, types


def export(params, out_dir: str, val_loss: float):
    """Write the trained model as a Q8_0 GGUF via the repo's own writer."""
    import jax
    from ntransformer_tpu.core.dtypes import DType
    from ntransformer_tpu.core.gguf import GGUFValueType, GGUFWriter
    from ntransformer_tpu.core.quant import quantize

    path = os.path.join(out_dir, f"{NAME}_q8.gguf")
    w = GGUFWriter(path)
    w.add_meta("general.architecture", "llama")
    w.add_meta("general.name", f"{NAME}-byte-{N_LAYERS}L")
    # this writer emits q/k rows UNPERMUTED (HF half-split rope order)
    w.add_meta("ntransformer.rope_style", "half")
    w.add_meta("llama.vocab_size", VOCAB)
    w.add_meta("llama.embedding_length", HIDDEN)
    w.add_meta("llama.feed_forward_length", INTER)
    w.add_meta("llama.block_count", N_LAYERS)
    w.add_meta("llama.attention.head_count", N_HEADS)
    w.add_meta("llama.attention.head_count_kv", N_KV)
    w.add_meta("llama.attention.layer_norm_rms_epsilon", EPS)
    w.add_meta("llama.rope.freq_base", ROPE_THETA)
    w.add_meta("llama.context_length", CTX)
    tokens, scores, types = byte_vocab()
    w.add_meta("tokenizer.ggml.tokens", tokens,
               vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.STRING)
    w.add_meta("tokenizer.ggml.scores", scores,
               vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.FLOAT32)
    w.add_meta("tokenizer.ggml.token_type", types,
               vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.INT32)
    w.add_meta("tokenizer.ggml.bos_token_id", BOS)
    w.add_meta("tokenizer.ggml.eos_token_id", EOS)
    w.add_meta("repolm.val_loss", float(val_loss))

    p = jax.tree.map(np.asarray, params)

    def q8(name, x):
        w.add_tensor(name, raw=quantize(np.asarray(x, np.float32), DType.Q8_0),
                     shape=x.shape, dtype=DType.Q8_0)

    q8("token_embd.weight", p["embed"])     # tied head: no output.weight
    for i in range(N_LAYERS):
        pre = f"blk.{i}."
        lw = jax.tree.map(lambda x: x[i], p["layers"])
        w.add_tensor(pre + "attn_norm.weight", lw["attn_norm"])
        q8(pre + "attn_q.weight", lw["wq"])
        q8(pre + "attn_k.weight", lw["wk"])
        q8(pre + "attn_v.weight", lw["wv"])
        q8(pre + "attn_output.weight", lw["wo"])
        w.add_tensor(pre + "ffn_norm.weight", lw["ffn_norm"])
        q8(pre + "ffn_gate.weight", lw["w_gate"])
        q8(pre + "ffn_up.weight", lw["w_up"])
        q8(pre + "ffn_down.weight", lw["w_down"])
    w.add_tensor("output_norm.weight", p["output_norm"])
    w.write()
    print(f"# wrote {path} ({os.path.getsize(path)/1e6:.2f} MB)",
          file=sys.stderr)
    import jax as _jax
    n_params = sum(int(np.prod(x.shape)) for x in _jax.tree.leaves(params))
    meta = {"val_loss": val_loss, "ppl": float(np.exp(val_loss)),
            "bits_per_byte": float(val_loss / np.log(2)),
            "params": f"{n_params/1e6:.1f}M", "corpus": "repo .py/.md",
            "shapes": dict(hidden=HIDDEN, inter=INTER, layers=N_LAYERS,
                           heads=N_HEADS, kv=N_KV)}
    with open(os.path.join(out_dir, f"{NAME}_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


if __name__ == "__main__":
    main()
