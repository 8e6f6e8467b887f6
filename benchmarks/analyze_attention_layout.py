"""HLO/layout evidence for the residual BERT attention formatting cost.

VERDICT r4 item 8: the roofline attributes ~5.9 ms/step (pre-rbg trace)
of "data formatting" inside the BERT block to attention layout copies at
T=34 — (B, 12, 34, 34) u32 dropout-mask relayouts and (B, 34, 12, 64)
head transposes — which two Pallas kernels (ops/pallas_attention.py,
ops/pallas_block_attention.py) and the einsum-attention variant
(HOP_TPU_BERT_EINSUM_ATTN) all tried to remove and measurably lost to.
This tool produces the closing evidence: it compiles the EXACT fused GAN
step bench.py times (same config, batch, PRNG scheme), dumps the
optimized HLO, and inventories every transpose/copy/fusion whose operand
or result carries the attention-shaped tensors, with their layouts —
quantifying how many forced relayouts exist, what traffic they move, and
which op forces each (dot_general operand layout vs rng-bit-generator
native layout).

Usage:
  python benchmarks/analyze_attention_layout.py [--batch-size 256]
      [--dataset ted] [--out benchmarks/ATTN_LAYOUT.json]
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(dataset: str, batch_size: int):
    import jax
    import jax.numpy as jnp
    from hop_tpu.config import expressive_config, ted_config
    from hop_tpu.data import synthetic
    from hop_tpu.models.hop import HOPModel
    from hop_tpu.models.multimodal_context import ConvDiscriminator
    from hop_tpu.train.llm import make_hop_train_steps

    cfg = ted_config() if dataset == "ted" else expressive_config()
    batch = synthetic.make_batch(cfg, batch_size, seed=0)
    batch["text_padded"] = batch["text_padded"] % cfg.llm.vocab_size
    batch = synthetic.add_device_features(batch, cfg)
    b = {k: jnp.asarray(v) for k, v in batch.items()
         if k in ("in_audio", "log_mel", "text_padded", "target_vec",
                  "vid_indices")}
    model = HOPModel(cfg, n_speakers=10)
    disc = ConvDiscriminator()
    n_pre = cfg.data.n_seed_frames
    gen_vars = jax.jit(lambda r: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(3)},
        b["in_audio"], b["log_mel"], b["text_padded"],
        b["target_vec"][:, :n_pre], b["vid_indices"],
        rng=r, train=True))(jax.random.PRNGKey(1))
    dis_vars = jax.jit(lambda: disc.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)},
        b["target_vec"], train=True))()
    vcfg = cfg.replace(hop=dataclasses.replace(cfg.hop, fused_step=True))
    _, gan_step, init_state = make_hop_train_steps(vcfg, model, disc)
    state = init_state(gen_vars, dis_vars)
    from hop_tpu.utils.prng import train_key
    return gan_step, state, b, train_key(100)


# shapes of interest, rendered the way HLO prints them (sizes filled in)
def attention_shape_patterns(B: int, H: int = 12, T: int = 34, D: int = 64):
    b2 = 2 * B  # the fused step batches the two speaker forwards
    pats = []
    for n in (B, b2):
        pats += [
            rf"\[{n},{H},{T},{T}\]",   # scores/probs/mask (B,H,T,T)
            rf"\[{n},{T},{H},{D}\]",   # head-split activations (B,T,H,D)
            rf"\[{n},{H},{T},{D}\]",   # attention-major activations
        ]
    return re.compile("|".join(pats))


# HLO layouts carry tiling/memory-space annotations, e.g.
# bf16[256,34,12,64]{3,1,2,0:T(8,128)(2,1)S(1)} — match any brace body
TRANSPOSE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?(?P<name>[%\w.\-]+)\s*=\s*"
    r"(?P<shape>\w+\[[\d,]*\](?:\{[^}]*\})?)"
    r"\s*(?P<op>transpose|copy|bitcast|bitcast-convert|reshape|fusion)\(",
    re.M)


def analyze_hlo(text: str, shape_pat: re.Pattern):
    """Count layout-changing ops touching attention-shaped tensors."""
    per_op: dict = collections.Counter()
    bytes_moved = 0
    examples: list = []
    dtype_bytes = {"f32": 4, "bf16": 2, "u32": 4, "s32": 4, "pred": 1,
                   "u8": 1, "f16": 2}
    for m in TRANSPOSE_RE.finditer(text):
        shape = m.group("shape")
        if not shape_pat.search(shape):
            continue
        op = m.group("op")
        per_op[f"{op} {shape.split('{')[0]}"] += 1
        dm = re.match(r"(\w+)\[([\d,]*)\]", shape)
        if dm and op in ("transpose", "copy"):
            n = 1
            for d in dm.group(2).split(","):
                if d:
                    n *= int(d)
            bytes_moved += 2 * n * dtype_bytes.get(dm.group(1), 4)
        if len(examples) < 12:
            # keep the full line for the report
            line_start = text.rfind("\n", 0, m.start()) + 1
            line_end = text.find("\n", m.start())
            examples.append(text[line_start:line_end].strip()[:300])
    return per_op, bytes_moved, examples


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--dataset", default="ted", choices=("ted", "expressive"))
    p.add_argument("--out", default=None)
    p.add_argument("--dump-hlo", default=None,
                   help="also write the full optimized HLO text here")
    p.add_argument("--hlo-in", default=None,
                   help="analyze an existing HLO dump instead of "
                        "compiling (no TPU needed)")
    args = p.parse_args(argv)

    if args.hlo_in:
        with open(args.hlo_in) as f:
            text = f.read()
    else:
        import jax
        gan_step, state, b, key = build_step(args.dataset, args.batch_size)
        print("lowering + compiling the fused GAN step ...", flush=True)
        compiled = jax.jit(gan_step).lower(state, b, key).compile()
        text = compiled.as_text()
        print(f"optimized HLO: {len(text) / 1e6:.1f} MB", flush=True)
        if args.dump_hlo:
            with open(args.dump_hlo, "w") as f:
                f.write(text)

    pat = attention_shape_patterns(args.batch_size)
    per_op, bytes_moved, examples = analyze_hlo(text, pat)

    # how many dots consume attention-shaped operands (the layout forcers)
    dots_bhtt = len(re.findall(
        r"dot\(", "\n".join(l for l in text.splitlines()
                            if pat.search(l) and "dot(" in l)))
    rngs = len(re.findall(r"rng-bit-generator", text))

    report = {
        "metric": "bert_attention_layout_inventory",
        "dataset": args.dataset, "batch_size": args.batch_size,
        "layout_changing_ops": dict(sorted(per_op.items())),
        "total_layout_ops": int(sum(per_op.values())),
        "round_trip_bytes_est": int(bytes_moved),
        "dots_on_attention_shapes": dots_bhtt,
        "rng_bit_generator_calls": rngs,
        "examples": examples,
    }
    print(json.dumps({k: v for k, v in report.items() if k != "examples"},
                     indent=1))
    for e in examples:
        print("  ", e)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
