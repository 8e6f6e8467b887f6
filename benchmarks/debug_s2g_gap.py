"""Bisect the speech2gesture forward gap vs the live reference.

Runs the reference's AudioEncoder stage by stage (first_net, make_1d,
down/up stack) against our flax counterpart with converted weights and
prints the max relative error after each stage. Eval mode (running BN
stats) so batch-stat noise can't mask a conv/resize mismatch.

Usage: JAX_PLATFORMS=cpu python benchmarks/debug_s2g_gap.py
"""

import importlib.machinery
import sys
import types

import numpy as np

sys.path.insert(0, "/root/repo")
for m in ("librosa", "soundfile", "lmdb", "fasttext"):
    if m not in sys.modules:
        mod = types.ModuleType(m)
        mod.__spec__ = importlib.machinery.ModuleSpec(m, loader=None)
        sys.modules[m] = mod
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from model import speech2gesture as s2g  # noqa: E402


def _tf_init(base):
    def init(self, *args, **kwargs):
        pad = kwargs.get("padding", "SAME")
        kw = dict(kwargs)
        kw["padding"] = 0
        base.__init__(self, *args, **kw)
        self.padding = pad
    return init


s2g.Conv1d_tf.__init__ = _tf_init(torch.nn.Conv1d)
s2g.Conv2d_tf.__init__ = _tf_init(torch.nn.Conv2d)

from hop_tpu.eval.torch_import_generator import convert_s2g_generator  # noqa: E402
from hop_tpu.models import speech2gesture as s2g_j  # noqa: E402


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


def main():
    torch.manual_seed(31)
    gen_t = s2g.Generator(34, 27, 4).float().eval()
    gen_j = s2g_j.Generator(n_poses=34, pose_dim=27, n_pre_poses=4)
    variables = convert_s2g_generator(gen_t.state_dict())

    r = np.random.default_rng(32)
    spec = r.standard_normal((2, 128, 70)).astype(np.float32)
    pre = (r.standard_normal((2, 4, 27)) * 0.1).astype(np.float32)

    enc_t = gen_t.audio_encoder
    with torch.no_grad():
        x = torch.from_numpy(spec).unsqueeze(1).float()
        t_stages = {}
        # first_net, layer by layer
        out = x
        for i, layer in enumerate(enc_t.first_net):
            out = layer(out)
            t_stages[f"first_net.{i}"] = out.numpy()
        out = enc_t.make_1d(out)
        t_stages["make_1d"] = out.numpy()
        x1 = out.squeeze(3)
        x2 = enc_t.down1(x1)
        x3 = enc_t.down2(x2)
        x4 = enc_t.down3(x3)
        x5 = enc_t.down4(x4)
        x6 = enc_t.down5(x5)
        x7 = enc_t.down6(x6)
        for n, v in (("down1", x2), ("down2", x3), ("down3", x4),
                     ("down4", x5), ("down5", x6), ("down6", x7)):
            t_stages[n] = v.numpy()
        u = enc_t.up1(x7, x6)
        t_stages["up1"] = u.numpy()
        u = enc_t.up2(u, x5)
        u = enc_t.up3(u, x4)
        u = enc_t.up4(u, x3)
        u = enc_t.up5(u, x2)
        t_stages["up5"] = u.numpy()
        full_t = gen_t(torch.from_numpy(spec),
                       torch.from_numpy(pre)).numpy()

    # our side: capture intermediates from AudioEncoder by re-running the
    # submodule with flax capture_intermediates
    enc_vars = {"params": variables["params"]["AudioEncoder_0"],
                "batch_stats": variables["batch_stats"]["AudioEncoder_0"]}
    enc_j = s2g_j.AudioEncoder(n_frames=34)
    out_j, state = enc_j.apply(
        enc_vars, jnp.asarray(spec), False,
        capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]

    def get(name):
        node = inter
        for part in name.split("/"):
            node = node[part]
        return np.asarray(node["__call__"][0])

    # flax ConvNormRelu_{0..7} == first_net.{0..7}; outputs are NHWC
    for i in range(8):
        ours = get(f"ConvNormRelu_{i}")
        theirs = np.transpose(t_stages[f"first_net.{i}"], (0, 2, 3, 1))
        print(f"first_net.{i}: rel={rel(ours, theirs):.3e} "
              f"shape ours={ours.shape} theirs={theirs.shape}")

    # our make_1d output isn't a module; recompute from first_net.7
    x = get("ConvNormRelu_7")
    resized = jax.image.resize(
        jnp.asarray(x), (x.shape[0], 34, 1, x.shape[3]), method="linear",
        antialias=False)
    theirs = np.transpose(t_stages["make_1d"], (0, 2, 3, 1))
    print(f"make_1d: rel={rel(resized, theirs):.3e}")

    stages = [("down1", "ConvNormRelu_9"), ("down2", "ConvNormRelu_10"),
              ("down3", "ConvNormRelu_11"), ("down4", "ConvNormRelu_12"),
              ("down5", "ConvNormRelu_13"), ("down6", "ConvNormRelu_14"),
              ("up1", "UnetUp_0"), ("up5", "UnetUp_4")]
    for tname, jname in stages:
        ours = get(jname)
        theirs = np.transpose(t_stages[tname], (0, 2, 1))
        print(f"{tname}: rel={rel(ours, theirs):.3e} "
              f"shape ours={ours.shape} theirs={theirs.shape}")

    full_j = gen_j.apply(variables, jnp.asarray(spec), jnp.asarray(pre),
                         False)
    print(f"generator full: rel={rel(full_j, full_t):.3e}")


if __name__ == "__main__":
    main()
