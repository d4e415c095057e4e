"""70B feasibility accounting (r1 verdict item 5a): prove — with exact
bits-per-weight arithmetic from the plane layouts, not hand-waved GB — that
Llama-3.1-70B Q4_K_M plus KV cache fits an 8-chip v5e host (8 × 16 GB), and
that the real 70B dims satisfy every TP-sharding alignment constraint the
kernels need. These are the numbers behind docs/PERFORMANCE.md's TP-resident
projection; the executable 70B-shaped step lives in
experiments/tp70b_cpu_mesh.py.

Reference bar: the reference RAN its 70B headline on one 24 GB GPU by
streaming (/root/reference/README.md:11-16); here the production answer is
8-way TP residency, and this test is the capacity proof.
"""
import numpy as np
import pytest

from ntransformer_tpu.core.dtypes import DType
from ntransformer_tpu.core.layout import LAYOUTS
from ntransformer_tpu.models.config import ModelConfig
from ntransformer_tpu.models.llama import Arch
from ntransformer_tpu.models.presets import PRESETS, q4_k_m_policy

GB = 1 << 30
V5E_HBM = 16 * GB
N_CHIPS = 8


def plane_bytes(dtype: DType, k: int, n: int) -> int:
    """Exact bytes of a [n, k] tensor in planar layout (== file bpw;
    core/layout.py docstring: de-interleaving adds zero overhead)."""
    total = 0
    for spec in LAYOUTS[dtype]:
        rows = k // spec.rows_div
        total += rows * n * np.dtype(spec.np_dtype).itemsize
    return total


def model_70b():
    p = PRESETS["70b"]
    head_dim = p["hidden"] // p["heads"]
    cfg = ModelConfig(
        model_name="llama70b-q4km", vocab_size=p["vocab"],
        hidden_size=p["hidden"], intermediate_size=p["inter"],
        n_layers=p["layers"], n_heads=p["heads"], n_kv_heads=p["kv_heads"],
        head_dim=head_dim, rope_theta=p["rope_theta"], max_seq_len=4096)
    return cfg, Arch.from_config(cfg)


def layer_tensors(cfg):
    h, it = cfg.hidden_size, cfg.intermediate_size
    kv_dim = cfg.n_kv_heads * cfg.head_dim
    return {
        "attn_q": (h, h), "attn_k": (kv_dim, h), "attn_v": (kv_dim, h),
        "attn_output": (h, h),
        "ffn_gate": (it, h), "ffn_up": (it, h), "ffn_down": (h, it),
    }


def test_70b_q4km_layer_bytes_match_published_size():
    """Per-layer bytes must land near the known Q4_K_M file size
    (~40 GB for the 70B model) — guards the bpw arithmetic itself."""
    cfg, _ = model_70b()
    per_layer = sum(plane_bytes(q4_k_m_policy(name), k, n)
                    for name, (n, k) in layer_tensors(cfg).items())
    per_layer += 2 * cfg.hidden_size * 4  # the two norm vectors (f32)
    embed = plane_bytes(q4_k_m_policy("token_embd"), cfg.hidden_size,
                        cfg.vocab_size)
    head = plane_bytes(q4_k_m_policy("output.weight"), cfg.hidden_size,
                       cfg.vocab_size)
    total = cfg.n_layers * per_layer + embed + head
    # llama.cpp's 70B Q4_K_M is ~42.5 GB; bpw arithmetic must be in range
    assert 38 * GB < total < 45 * GB, total / GB
    # and a single layer is ~0.5 GB (the SLEP streaming unit)
    assert 0.4 * GB < per_layer < 0.65 * GB, per_layer / GB


def test_70b_q4km_plus_kv_fits_8x16gb():
    """8-way TP residency: shard bytes + full KV + workspace < 16 GB/chip,
    with margin. KV at the full 4096 context, bf16."""
    cfg, arch = model_70b()
    per_layer = sum(plane_bytes(q4_k_m_policy(name), k, n)
                    for name, (n, k) in layer_tensors(cfg).items())
    per_layer += 2 * cfg.hidden_size * 4
    embed = plane_bytes(q4_k_m_policy("token_embd"), cfg.hidden_size,
                        cfg.vocab_size)
    head = plane_bytes(q4_k_m_policy("output.weight"), cfg.hidden_size,
                       cfg.vocab_size)
    weights = cfg.n_layers * per_layer + embed + head

    kv_bytes = (arch.n_layers * arch.n_kv_heads * arch.max_seq_len
                * arch.head_dim * 2 * 2)  # k+v, bf16
    # per chip: weights/8 (everything is row- or column-sharded), KV/8
    # (head-sharded: 8 kv heads over 8 chips), replicated norms/rope are
    # noise; leave 1 GB workspace + runtime margin
    per_chip = weights / N_CHIPS + kv_bytes / N_CHIPS + 1 * GB
    assert per_chip < V5E_HBM * 0.85, f"{per_chip / GB:.2f} GB/chip"
    # also record the headroom is real: int8 KV halves the cache term
    per_chip_int8 = weights / N_CHIPS + kv_bytes / 2 / N_CHIPS + 1 * GB
    assert per_chip_int8 < per_chip


def test_70b_dims_satisfy_tp8_alignment():
    """check_shardable must accept the real 70B dims at tp=8 with kernel
    alignment on (Pallas tiling constraints: K/tp % 256, N/tp % 128)."""
    from ntransformer_tpu.ops.linear import QLinear
    from ntransformer_tpu.parallel.tp import check_shardable
    from ntransformer_tpu.models.llama import LayerWeights, ModelWeights

    cfg, arch = model_70b()

    def shell(n, k, name):
        return QLinear(q4_k_m_policy(name), k, n, {})

    h, it, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kv_dim = cfg.n_kv_heads * cfg.head_dim
    lw = LayerWeights(
        attn_norm=None,
        wq=shell(h, h, "attn_q"), wk=shell(kv_dim, h, "attn_k"),
        wv=shell(kv_dim, h, "attn_v"), wo=shell(h, h, "attn_output"),
        ffn_norm=None,
        w_gate=shell(it, h, "ffn_gate"), w_up=shell(it, h, "ffn_up"),
        w_down=shell(h, it, "ffn_down"))
    weights = ModelWeights(embed=shell(v, h, "token_embd"), layers=lw,
                           output_norm=None,
                           lm_head=shell(v, h, "output.weight"),
                           rope_cos=None, rope_sin=None)
    check_shardable(arch, weights, 8, kernel_alignment=True)
    # 8 KV heads over 8 chips: attention needs zero communication
    assert arch.n_kv_heads % 8 == 0


def test_70b_tiered_tier_sizing_on_16gb():
    """Single-chip fallback: TierConfig at 16 GB HBM with the real layer
    size yields the documented ~20 resident + ~60 streamed split."""
    from ntransformer_tpu.memory.tiers import TierConfig
    cfg, arch = model_70b()
    per_layer = sum(plane_bytes(q4_k_m_policy(name), k, n)
                    for name, (n, k) in layer_tensors(cfg).items())
    embed = plane_bytes(q4_k_m_policy("token_embd"), cfg.hidden_size,
                        cfg.vocab_size)
    kv_bytes = (arch.n_layers * arch.n_kv_heads * arch.max_seq_len
                * arch.head_dim * 2 * 2)
    reserve = 2 * embed + kv_bytes + (64 << 20) + 2 * per_layer
    tc = TierConfig.compute(cfg.n_layers, per_layer, reserve,
                            hbm_bytes=V5E_HBM, ram_bytes=120 * GB)
    assert 14 <= tc.n_hbm <= 24, tc
    assert tc.n_hbm + tc.n_ram + tc.n_disk == cfg.n_layers
