"""Measure the PyTorch reference's HOP train step on this host (CPU).

Runs the reference's OWN code (mounted read-only at /root/reference):
model/HOP.py Model + multimodal_context_net.ConvDiscriminator driven by
train_eval/train_llm.train_llm with synthetic tensors of the exact training
shapes (run_ted.py: batch 256, in_audio 36267, log-mel (34,128), 34x27
targets), GAN phase (epoch > 10: D step + G step + rand-vid forward = the
same 3-forward structure our bench measures).

No CUDA exists here and the reference's CUDA 10.1 GPU figure is not
reproducible, so this records the torch-CPU denominator and, paired with
`python bench.py --platform cpu`, a same-host torch-vs-JAX software ratio.
Results land in benchmarks/BASELINE_MEASURED.json which bench.py reads.

Usage: python benchmarks/measure_reference.py [--batch-size 256]
       [--steps 2] [--warmup 1] [--ref /root/reference]
"""

import argparse
import json
import os
import sys
import time
import types


def _stub(name):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        # transformers probes importlib.util.find_spec on optional deps;
        # a spec-less stub makes that raise, so give it a real-looking spec
        import importlib.machinery
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod


def build_reference_step(ref_path, batch_size, llm_layers=6, seed=0,
                         dataset="TED"):
    # The reference imports DSP/storage libs at module level that are not
    # in this image and are not touched by the model/step code paths we
    # time; stub them so `model.HOP` / `train_eval.train_llm` import.
    for m in ("librosa", "soundfile", "lmdb", "fasttext"):
        _stub(m)
    sys.path.insert(0, ref_path)

    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(seed)

    cfg = BertConfig()  # bert-base-uncased architecture
    cfg.num_hidden_layers = llm_layers
    cfg.output_attentions = True
    cfg.output_hidden_states = True
    llm_model = BertModel(cfg)  # random init: identical FLOPs/step time

    class _Tok:  # Model.__init__ only reads/sets pad/eos token attrs
        eos_token = None
        pad_token = None

        def add_special_tokens(self, d):
            return 0

    class _Speakers:
        n_words = 10

    # TED: run_ted.py:84-92; expressive: run_expressive.py:81-100
    # (pose_dim 126 -> num_nodes=42 in HOP.py:139, same audio unfold)
    expressive = dataset != "TED"
    args = argparse.Namespace(
        d_model=128, n_heads=8, d_ff=128, dropout=0.1,
        llm_model="BERT", llm_dim=768,
        datasets="TED_expressive" if expressive else "TED",
        n_poses=34, pose_dim=126 if expressive else 27,
        wordembed_dim=300, n_pre_poses=4,
        z_type="speaker",
        loss_regression_weight=2100.0 if expressive else 600.0,
        loss_gan_weight=5.0,
        loss_kld_weight=0.8 if expressive else 0.6,
        loss_reg_weight=0.5 if expressive else 0.4,
        use_gwnet=True, use_reprograme=True, llm_layers=llm_layers,
        learning_rate=0.005 if expressive else 0.01,
    )

    from model import HOP
    from model.multimodal_context_net import ConvDiscriminator
    from train_eval.train_llm import train_llm
    from accelerate import Accelerator

    model = HOP.Model(args, llm_model, _Tok(), _Speakers()).float()
    discriminator = ConvDiscriminator(args.pose_dim)
    trained = [p for p in model.parameters() if p.requires_grad]
    n_params = sum(p.numel() for p in trained)
    model_optim = torch.optim.Adam(trained, lr=args.learning_rate,
                                   betas=(0.5, 0.999))
    dis_optimizer = torch.optim.Adam(discriminator.parameters(),
                                     lr=args.learning_rate * 0.1,
                                     betas=(0.5, 0.999))
    accelerator = Accelerator(cpu=True)

    g = torch.Generator().manual_seed(seed)
    in_audio = torch.randn(batch_size, 36267, generator=g)
    log_mel = torch.randn(batch_size, 34, 128, generator=g)
    text_tokens = torch.randint(0, cfg.vocab_size, (batch_size, 34),
                                generator=g)
    target = torch.randn(batch_size, 34, args.pose_dim, generator=g) * 0.1
    vids = torch.randint(0, 10, (batch_size,), generator=g)

    def step(epoch=12):  # epoch > 10: full GAN-phase step
        return train_llm(args, epoch, in_audio, log_mel, text_tokens,
                         target, vids, model, discriminator,
                         model_optim, dis_optimizer, accelerator)

    return step, n_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--llm-layers", type=int, default=6)
    p.add_argument("--ref", default="/root/reference")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BASELINE_MEASURED.json"))
    p.add_argument("--count-flops", action="store_true",
                   help="count matmul/conv FLOPs of one full train step "
                        "with torch.utils.flop_counter instead of timing; "
                        "used to derive the GPU speed-of-light baseline")
    p.add_argument("--dataset", default="TED",
                   choices=("TED", "expressive"),
                   help="expressive = run_expressive.py's config (pose_dim "
                        "126, num_nodes 42, lr 0.005, weights 2100/5/0.8/"
                        "0.5); entries land under *_expressive_bs{N} keys")
    a = p.parse_args()
    tag = "" if a.dataset == "TED" else "_expressive"

    import torch
    step, n_params = build_reference_step(a.ref, a.batch_size, a.llm_layers,
                                          dataset=a.dataset)
    print(f"reference HOP trainable params: {n_params}", file=sys.stderr)

    if a.count_flops:
        from torch.utils.flop_counter import FlopCounterMode
        counter = FlopCounterMode(display=False)
        with counter:
            step()
        flops = int(counter.get_total_flops())
        result = {
            "metric": f"reference_hop_ted{tag}_gan_step_flops",
            "value": flops,
            "unit": "FLOP/step",
            "batch_size": a.batch_size,
            "note": "matmul/conv FLOPs, fwd+bwd, full GAN-phase step "
                    "(aten-level; excludes elementwise ops)",
        }
        print(json.dumps(result))
        merged = {}
        if os.path.exists(a.out):
            with open(a.out) as f:
                merged = json.load(f)
        merged[f"flops{tag}_bs{a.batch_size}"] = result
        with open(a.out, "w") as f:
            json.dump(merged, f, indent=1)
        return

    for _ in range(a.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(a.steps):
        ret = step()
    dt = (time.perf_counter() - t0) / a.steps

    result = {
        "metric": f"reference_hop_ted{tag}_gan_step_s_per_iter",
        "value": dt,
        "unit": "s/iter",
        "batch_size": a.batch_size,
        "hardware": f"torch-{torch.__version__} CPU ({os.cpu_count()} core)",
        "trainable_params": n_params,
        "loss_keys": sorted(ret),
    }
    print(json.dumps(result))

    merged = {}
    if os.path.exists(a.out):
        with open(a.out) as f:
            merged = json.load(f)
    merged[f"torch_cpu{tag}_bs{a.batch_size}"] = result
    with open(a.out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {a.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
