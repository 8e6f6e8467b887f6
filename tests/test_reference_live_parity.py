"""Ground-truth parity against the reference's OWN torch code.

Every other parity test in this suite compares against torch modules the
builder re-wrote; these import /root/reference's actual `model.HOP`,
`model.gwnet`, `model.multimodal_context_net` and
`train_eval.train_llm` (with the same four module stubs
benchmarks/measure_reference.py uses for DSP/storage libs the model code
never touches), copy the weights through our converters, and assert
forward and loss-step parity. A shared misreading of the reference can no
longer pass: the oracle is their code.

Determinism protocol (both sides, applied symmetrically in each test):
  * gaussian draws zeroed — torch.randn_like / jax.random.normal return
    zeros, so reparameterize gives z == mu and the D-step noise vanishes;
  * the diversity-regulariser permutation pinned to a roll-by-one —
    torch.randperm -> (arange+1) % n, jax.random.permutation -> roll(-1);
  * dropout off — every torch nn.Dropout p=0 / GRU dropout=0, flax
    Dropout patched to identity (the reference trains with reprogramming
    attention dropout 0.1; zeroing it on BOTH sides keeps the comparison
    exact without changing either side's math);
  * BatchNorm: train-mode forwards use batch statistics on both sides,
    eval-mode forwards use the (converted) running stats — deterministic
    either way.
"""

import argparse
import dataclasses
import importlib.machinery
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as fnn

from hop_tpu.config import ted_config
from hop_tpu.eval.torch_import_hop import convert_hop_model, convert_gwnet
from hop_tpu.eval.torch_import_generator import (convert_pose_generator,
                                                 convert_conv_discriminator)
from hop_tpu.models.hop import HOPModel
from hop_tpu.models.gwnet import GraphWaveNet
from hop_tpu.models.multimodal_context import (PoseGenerator,
                                               ConvDiscriminator)
from hop_tpu.train.llm import make_hop_train_steps

pytestmark = pytest.mark.slow

REF = "/root/reference"
N_SPEAKERS = 10


@pytest.fixture(scope="module")
def ref():
    """Import the live reference modules (stubbing DSP/storage libs their
    module scope pulls in but the timed/compared code never calls)."""
    added = []
    for m in ("librosa", "soundfile", "lmdb", "fasttext"):
        if m not in sys.modules:
            mod = types.ModuleType(m)
            mod.__spec__ = importlib.machinery.ModuleSpec(m, loader=None)
            sys.modules[m] = mod
            added.append(m)
    sys.path.insert(0, REF)
    import torch
    from model import HOP, gwnet, multimodal_context_net, vocab
    from train_eval.train_llm import train_llm
    yield SimpleNamespace(torch=torch, HOP=HOP, gwnet=gwnet,
                          mcn=multimodal_context_net, vocab=vocab,
                          train_llm=train_llm)
    sys.path.remove(REF)
    for m in added:
        sys.modules.pop(m, None)
    for name in [k for k in list(sys.modules)
                 if k.split(".")[0] in ("model", "train_eval", "data_loader",
                                        "utils")]:
        sys.modules.pop(name, None)


def _ref_args(llm_layers):
    """run_ted.py defaults, as measure_reference.py assembles them."""
    return argparse.Namespace(
        d_model=128, n_heads=8, d_ff=128, dropout=0.1,
        llm_model="BERT", llm_dim=768, datasets="TED",
        n_poses=34, pose_dim=27, wordembed_dim=300, n_pre_poses=4,
        z_type="speaker", loss_regression_weight=600.0, loss_gan_weight=5.0,
        loss_kld_weight=0.6, loss_reg_weight=0.4,
        use_gwnet=True, use_reprograme=True, llm_layers=llm_layers,
        learning_rate=0.01)


class _Tok:
    eos_token = None
    pad_token = None

    def add_special_tokens(self, d):
        return 0


class _Speakers:
    n_words = N_SPEAKERS


def _build_torch_hop(ref, llm_layers, seed=0):
    torch = ref.torch
    from transformers import BertConfig, BertModel
    torch.manual_seed(seed)
    # dropout must be zeroed in the CONFIG, not just the nn.Dropout
    # modules: torch 2.x BertModel defaults to sdpa attention, which reads
    # config.attention_probs_dropout_prob at forward time in train mode —
    # _zero_dropout alone left real dropout noise in the torch oracle
    # (0.1 max-abs on the LLM output, ~5e-3 on the HOP forward, 2% on the
    # DIV_REG quotient)
    bcfg = BertConfig(num_hidden_layers=llm_layers,
                      attention_probs_dropout_prob=0.0,
                      hidden_dropout_prob=0.0)
    llm = BertModel(bcfg)
    return ref.HOP.Model(_ref_args(llm_layers), llm, _Tok(),
                         _Speakers()).float()


def _our_cfg(llm_layers):
    cfg = ted_config()
    # parity mode: these tests pin the reference's exact 3-forward
    # sequential step, not the fused production default
    return cfg.replace(
        llm=dataclasses.replace(cfg.llm, n_layers=llm_layers,
                                compute_bf16=False),
        hop=dataclasses.replace(cfg.hop, fused_step=False))


def _zero_dropout(torch, *modules):
    for module in modules:
        for m in module.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
            if isinstance(m, torch.nn.GRU):
                m.dropout = 0.0


def _patch_gaussians(monkeypatch, torch):
    monkeypatch.setattr(torch, "randn_like",
                        lambda t, **k: torch.zeros_like(t))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32, *a, **k:
            jnp.zeros(shape, dtype))


def _patch_permutations(monkeypatch, torch):
    monkeypatch.setattr(torch, "randperm",
                        lambda n, **k: (torch.arange(n) + 1) % n)
    monkeypatch.setattr(jax.random, "permutation",
                        lambda key, x, *a, **k: jnp.roll(x, -1))


def _patch_flax_dropout(monkeypatch):
    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, inputs, deterministic=None, rng=None: inputs)


def _hop_inputs(B, seed=7, pose_dim=27):
    r = np.random.default_rng(seed)
    return {
        "in_audio": r.standard_normal((B, 36267)).astype(np.float32),
        "log_mel": r.standard_normal((B, 34, 128)).astype(np.float32),
        "text": r.integers(0, 30522, (B, 34)).astype(np.int64),
        "target": (r.standard_normal((B, 34, pose_dim)) * 0.1
                   ).astype(np.float32),
        "vids": (np.arange(B) % N_SPEAKERS).astype(np.int64),
    }


# ---------------------------------------------------------------------------
# forward parity
# ---------------------------------------------------------------------------

def test_hop_full_forward_parity(ref, monkeypatch):
    """model/HOP.py:177-252 forecast vs HOPModel.__call__ — same weights,
    same inputs, eval mode, z == mu."""
    torch = ref.torch
    _patch_gaussians(monkeypatch, torch)

    model_t = _build_torch_hop(ref, llm_layers=6)
    model_t.eval()
    x = _hop_inputs(2)
    with torch.no_grad():
        out_t, z_t, mu_t, logvar_t = model_t(
            torch.from_numpy(x["in_audio"]), torch.from_numpy(x["log_mel"]),
            torch.from_numpy(x["text"]),
            torch.from_numpy(x["target"][:, :16]),
            torch.from_numpy(x["vids"]))

    cfg = _our_cfg(6)
    variables = convert_hop_model(model_t.state_dict(), cfg)
    model_j = HOPModel(cfg, n_speakers=N_SPEAKERS)
    out_j, z_j, mu_j, logvar_j = model_j.apply(
        variables, jnp.asarray(x["in_audio"]), jnp.asarray(x["log_mel"]),
        jnp.asarray(x["text"]), jnp.asarray(x["target"][:, :16]),
        jnp.asarray(x["vids"]), rng=jax.random.PRNGKey(0), train=False)

    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_gwnet_forward_parity_live(ref):
    """model/gwnet.py:49-249 (adaptive adjacency, as HOP constructs it,
    HOP.py:143) vs GraphWaveNet, converted weights."""
    torch = ref.torch
    torch.manual_seed(1)
    net_t = ref.gwnet.gwnet(
        torch.device("cpu"), 9, dropout=0, supports=None, gcn_bool=True,
        addaptadj=True, aptinit=None, in_dim=173, out_dim=173,
        residual_channels=64, dilation_channels=64, skip_channels=256,
        end_channels=512)
    net_t.eval()
    x = np.random.default_rng(0).standard_normal(
        (2, 173, 9, 16)).astype(np.float32)  # torch layout (B, C, N, T)
    with torch.no_grad():
        y_t = net_t(torch.from_numpy(x))

    params, stats = convert_gwnet(net_t.state_dict(), prefix="", n_layers=8)
    net_j = GraphWaveNet(num_nodes=9, in_dim=173, out_dim=173,
                         residual_channels=64, dilation_channels=64,
                         skip_channels=256, end_channels=512)
    y_j = net_j.apply({"params": params, "batch_stats": stats},
                      jnp.transpose(jnp.asarray(x), (0, 3, 2, 1)),
                      train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 2, 1)),
                               y_t.numpy(), rtol=1e-5, atol=1e-5)


def test_pose_generator_forward_parity_live(ref, monkeypatch):
    """multimodal_context_net.PoseGenerator (:66-172) vs our PoseGenerator,
    weights converted with convert_pose_generator."""
    torch = ref.torch
    _patch_gaussians(monkeypatch, torch)
    torch.manual_seed(2)

    spk = ref.vocab.Vocab("spk")
    for i in range(N_SPEAKERS - spk.n_words):
        spk.index_word(f"s{i}")
    args = argparse.Namespace(n_pre_poses=4, n_poses=34,
                              input_context="both", hidden_size=300,
                              n_layers=4, dropout_prob=0.3,
                              freeze_wordembed=False)
    n_words = 50
    gen_t = ref.mcn.PoseGenerator(args, pose_dim=27, n_words=n_words,
                                  word_embed_size=300, word_embeddings=None,
                                  z_obj=spk).float()
    gen_t.eval()

    r = np.random.default_rng(3)
    B = 2
    target = (r.standard_normal((B, 34, 27)) * 0.1).astype(np.float32)
    pre_seq = np.zeros((B, 34, 28), np.float32)   # train_gan.py:20-22
    pre_seq[:, :4, :-1] = target[:, :4]
    pre_seq[:, :4, -1] = 1.0
    in_text = r.integers(0, n_words, (B, 34)).astype(np.int64)
    in_audio = r.standard_normal((B, 36267)).astype(np.float32)
    vids = (np.arange(B) % N_SPEAKERS).astype(np.int64)

    with torch.no_grad():
        out_t, z_t, mu_t, _ = gen_t(
            torch.from_numpy(pre_seq), torch.from_numpy(in_text),
            torch.from_numpy(in_audio), torch.from_numpy(vids))

    gen_j = PoseGenerator(pose_dim=27, n_words=n_words,
                          n_speakers=N_SPEAKERS)
    variables = convert_pose_generator(gen_t.state_dict())
    out_j, z_j, mu_j, _ = gen_j.apply(
        variables, jnp.asarray(pre_seq), jnp.asarray(in_text),
        jnp.asarray(in_audio), jnp.asarray(vids),
        rng=jax.random.PRNGKey(0), train=False)

    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_conv_discriminator_forward_parity_live(ref):
    """multimodal_context_net.ConvDiscriminator (:219-268), eval mode."""
    torch = ref.torch
    torch.manual_seed(4)
    dis_t = ref.mcn.ConvDiscriminator(27).float()
    dis_t.eval()
    poses = (np.random.default_rng(5).standard_normal((3, 34, 27)) * 0.1
             ).astype(np.float32)
    with torch.no_grad():
        y_t = dis_t(torch.from_numpy(poses))
    dis_j = ConvDiscriminator()
    variables = convert_conv_discriminator(dis_t.state_dict())
    y_j = dis_j.apply(variables, jnp.asarray(poses), train=False)
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# loss-step parity (the reference's own train_llm drives the torch side)
# ---------------------------------------------------------------------------

def _torch_step_setup(ref, llm_layers, cfg):
    torch = ref.torch
    model_t = _build_torch_hop(ref, llm_layers)
    model_t.train()
    dis_t = ref.mcn.ConvDiscriminator(27).float()
    dis_t.train()
    _zero_dropout(torch, model_t, dis_t)
    trained = [p for p in model_t.parameters() if p.requires_grad]
    g_opt = torch.optim.Adam(trained, lr=cfg.train.learning_rate,
                             betas=cfg.train.betas)
    d_opt = torch.optim.Adam(
        dis_t.parameters(),
        lr=cfg.train.learning_rate * cfg.train.dis_lr_scale,
        betas=cfg.train.betas)
    from accelerate import Accelerator
    acc = Accelerator(cpu=True)
    return model_t, dis_t, g_opt, d_opt, acc


def _our_step_setup(cfg, model_t, dis_t):
    model_j = HOPModel(cfg, n_speakers=N_SPEAKERS)
    dis_j = ConvDiscriminator()
    gen_vars = convert_hop_model(model_t.state_dict(), cfg)
    dis_vars = convert_conv_discriminator(dis_t.state_dict())
    warmup_step, gan_step, init_state = make_hop_train_steps(
        cfg, model_j, dis_j)
    state = init_state(gen_vars, dis_vars)
    return warmup_step, gan_step, state


def _our_batch(x):
    return {"in_audio": jnp.asarray(x["in_audio"]),
            "log_mel": jnp.asarray(x["log_mel"]),
            "text_padded": jnp.asarray(x["text"]),
            "target_vec": jnp.asarray(x["target"]),
            "vid_indices": jnp.asarray(x["vids"])}


def _assert_metrics_match(ours, theirs, rel):
    for key, want in theirs.items():
        got = float(ours[key])
        # DIV_REG is a quotient of two forward-DIFFERENCE quantities
        # (pose_l1 between the vids/rand-vids forwards over z_l1,
        # train_llm.py:60-69); residual cross-framework forward noise
        # barely cancels in the difference, so this term carries ~10x the
        # relative noise of the direct losses (it was 2e-2 off until the
        # torch-side sdpa attention dropout was zeroed in the CONFIG —
        # see _build_torch_hop)
        key_rel = rel * 25 if key == "DIV_REG" else rel
        assert got == pytest.approx(want, rel=key_rel, abs=1e-5), (
            f"{key}: ours={got} reference={want}")


@pytest.mark.parametrize("llm_layers", [2])
def test_train_llm_warmup_step_parity(ref, monkeypatch, llm_layers):
    """Pre-GAN step (epoch <= 10): huber + KLD + diversity values from the
    reference's train_llm (train_eval/train_llm.py:40-98) match ours, and a
    second step (through both Adam updates) still matches."""
    torch = ref.torch
    _patch_gaussians(monkeypatch, torch)
    _patch_permutations(monkeypatch, torch)
    _patch_flax_dropout(monkeypatch)

    cfg = _our_cfg(llm_layers)
    model_t, dis_t, g_opt, d_opt, acc = _torch_step_setup(
        ref, llm_layers, cfg)
    warmup_step, _, state = _our_step_setup(cfg, model_t, dis_t)

    args = _ref_args(llm_layers)
    x = _hop_inputs(4)
    tt = {k: torch.from_numpy(v) for k, v in x.items()}
    batch = _our_batch(x)
    init_kernels = {k: np.array(state.gen_params[k]["kernel"])
                    for k in ("out_fc2", "beat_fc1")}

    for step_i, rel in ((1, 2e-3), (2, 1e-2)):
        ret = ref.train_llm(args, 5, tt["in_audio"], tt["log_mel"],
                            tt["text"], tt["target"], tt["vids"],
                            model_t, dis_t, g_opt, d_opt, acc)
        state, metrics = warmup_step(state, batch,
                                     jax.random.PRNGKey(step_i))
        assert set(ret) == {"loss", "KLD", "DIV_REG"}
        _assert_metrics_match(metrics, ret, rel)

    # post-step parameter check, relative to the update magnitude: step-1
    # Adam is ~ lr*sign(grad) per element, so elements whose true gradient
    # is below the cross-framework fp32 noise floor flip sign — an
    # elementwise comparison is meaningless there. Instead require the
    # MEAN deviation between the two frameworks' updated params to be a
    # small fraction of the mean update they both took.
    sd = convert_hop_model(model_t.state_dict(), cfg)
    for key in ("out_fc2", "beat_fc1"):
        ours = np.asarray(state.gen_params[key]["kernel"])
        theirs = np.asarray(sd["params"][key]["kernel"])
        update = np.abs(theirs - init_kernels[key]).mean()
        ratio = np.abs(ours - theirs).mean() / update
        # step-1 Adam moves EVERY element by exactly ±lr (g/sqrt(g^2)), so
        # ratio ~= 2 * (fraction of elements whose tiny true gradient sits
        # below the fp32 noise floor and flipped sign); beat_fc1 sees only
        # 16 windows x B=4 of random audio, so ~15% of its gradient
        # entries are noise-floor -> ratio up to ~0.3 with correct math
        assert ratio < 0.05, f"{key}: |ours-theirs|/|update| = {ratio:.4f}"


@pytest.mark.parametrize("llm_layers", [2])
def test_train_llm_gan_step_parity(ref, monkeypatch, llm_layers):
    """Full GAN-phase step (epoch > 10, train_llm.py:15-98): D update on
    (zeroed-)noise targets, G update with the adversarial term — loss
    values and the D update itself match."""
    torch = ref.torch
    _patch_gaussians(monkeypatch, torch)
    _patch_permutations(monkeypatch, torch)
    _patch_flax_dropout(monkeypatch)

    cfg = _our_cfg(llm_layers)
    model_t, dis_t, g_opt, d_opt, acc = _torch_step_setup(
        ref, llm_layers, cfg)
    _, gan_step, state = _our_step_setup(cfg, model_t, dis_t)

    args = _ref_args(llm_layers)
    x = _hop_inputs(4, seed=11)
    tt = {k: torch.from_numpy(v) for k, v in x.items()}
    batch = _our_batch(x)
    dis_init = {k: np.array(state.dis_params[k]["kernel"])
                for k in ("Dense_0", "Dense_1")}

    ret = ref.train_llm(args, 12, tt["in_audio"], tt["log_mel"],
                        tt["text"], tt["target"], tt["vids"],
                        model_t, dis_t, g_opt, d_opt, acc)
    state, metrics = gan_step(state, batch, jax.random.PRNGKey(0))
    assert set(ret) == {"loss", "KLD", "DIV_REG", "gen", "dis"}
    _assert_metrics_match(metrics, ret, rel=1e-4)

    # the discriminator Adam step agrees (shallow net -> tight gradients);
    # same update-relative criterion as the warmup test
    dsd = convert_conv_discriminator(dis_t.state_dict())
    for key in ("Dense_0", "Dense_1"):
        ours = np.asarray(state.dis_params[key]["kernel"])
        theirs = np.asarray(dsd["params"][key]["kernel"])
        update = np.abs(theirs - dis_init[key]).mean()
        ratio = np.abs(ours - theirs).mean() / update
        assert ratio < 0.02, f"{key}: |ours-theirs|/|update| = {ratio:.4f}"

    # second step exercises parity through BOTH updated networks. The
    # comparison is loose by necessity: step-1 Adam moves every G weight
    # by exactly +-lr, and weights whose true gradient is below the fp32
    # noise floor take opposite signs in the two frameworks — after that
    # the GAN feedback (-log D(out)) amplifies the divergence chaotically.
    # Step-1 matching at 0.2% plus the D-update ratio check above carry
    # the exactness claim; this asserts the trajectories stay together.
    ret2 = ref.train_llm(args, 12, tt["in_audio"], tt["log_mel"],
                         tt["text"], tt["target"], tt["vids"],
                         model_t, dis_t, g_opt, d_opt, acc)
    state, metrics2 = gan_step(state, batch, jax.random.PRNGKey(1))
    _assert_metrics_match(metrics2, ret2, rel=0.05)


# ---------------------------------------------------------------------------
# hierarchy (HA2G) stack vs live reference modules
# ---------------------------------------------------------------------------

def test_resnet_se_forward_parity_live(ref):
    """ResNetSE34V2.ResNetSE (:13-219) with SEBasicBlocks vs our ResNetSE:
    multi-scale taps, pixel-shuffle upsampling, speaker-blend weights."""
    torch = ref.torch
    import importlib
    rse_mod = importlib.import_module("model.ResNetSE34V2")
    blocks_mod = importlib.import_module("model.ResNetBlocks")
    from hop_tpu.eval.torch_import_generator import convert_resnet_se
    from hop_tpu.models.resnet_se import ResNetSE
    from hop_tpu import geometry

    torch.manual_seed(6)
    spk = ref.vocab.Vocab("spk")
    for i in range(N_SPEAKERS - spk.n_words):
        spk.index_word(f"s{i}")
    net_t = rse_mod.ResNetSE(
        argparse.Namespace(), blocks_mod.SEBasicBlock, [3, 4, 6, 3],
        [32, 64, 128, 256], nOut=32, z_obj=spk, pose_level=3,
        n_mels=128).float()
    net_t.eval()

    T = geometry.calc_spectrogram_length_from_motion_length(34, 15)
    B = 2
    spec = np.random.default_rng(8).standard_normal(
        (B, 128, T)).astype(np.float32)
    vids = (np.arange(B) % N_SPEAKERS).astype(np.int64)
    with torch.no_grad():
        w_t, lo_t, mi_t, hi_t, blends_t = net_t(
            torch.from_numpy(spec).unsqueeze(1), torch.from_numpy(vids))

    net_j = ResNetSE(n_speakers=N_SPEAKERS, pose_level=3)
    variables = convert_resnet_se(net_t.state_dict())
    w_j, lo_j, mi_j, hi_j, blends_j = net_j.apply(
        variables, jnp.asarray(spec), jnp.asarray(vids), train=False)

    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    for ours, theirs, name in ((lo_j, lo_t, "low"), (mi_j, mi_t, "mid"),
                               (hi_j, hi_t, "high")):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=5e-6,
            err_msg=f"feat_{name}")
    for i, (bj, bt) in enumerate(zip(blends_j, blends_t)):
        np.testing.assert_allclose(np.asarray(bj), bt.numpy(),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"blend level {i}")


def test_hierarchical_generator_forward_parity_live(ref, monkeypatch):
    """hierarchy_net.Hierarchical_PoseGenerator (:55-149) vs our
    HierarchicalPoseGenerator — incl. the keyword LeakyReLU(inplace=True)
    whose slope REALLY is 0.01 here (vs the trimodal generator's
    positional LeakyReLU(True) == identity)."""
    torch = ref.torch
    _patch_gaussians(monkeypatch, torch)
    import importlib
    hn = importlib.import_module("model.hierarchy_net")
    from hop_tpu.eval.torch_import_generator import (
        convert_hierarchical_generator)
    from hop_tpu.models.hierarchy import HierarchicalPoseGenerator

    torch.manual_seed(9)
    spk = ref.vocab.Vocab("spk")
    for i in range(N_SPEAKERS - spk.n_words):
        spk.index_word(f"s{i}")
    args = argparse.Namespace(n_pre_poses=4, n_poses=34,
                              input_context="both", hidden_size=300,
                              n_layers=4, dropout_prob=0.3,
                              freeze_wordembed=False)
    n_words, pose_dim = 50, 30
    gen_t = hn.Hierarchical_PoseGenerator(
        args, pose_dim=pose_dim, n_words=n_words, word_embed_size=300,
        word_embeddings=None, z_obj=spk).float()
    gen_t.eval()

    r = np.random.default_rng(10)
    B = 2
    pre_seq = (r.standard_normal((B, 34, pose_dim + 1)) * 0.1
               ).astype(np.float32)
    in_text = r.integers(0, n_words, (B, 34)).astype(np.int64)
    audio_feat = r.standard_normal((B, 34, 32)).astype(np.float32)
    vids = (np.arange(B) % N_SPEAKERS).astype(np.int64)
    with torch.no_grad():
        out_t, z_t, mu_t, _ = gen_t(
            torch.from_numpy(pre_seq), torch.from_numpy(in_text),
            torch.from_numpy(audio_feat), torch.from_numpy(vids))

    gen_j = HierarchicalPoseGenerator(pose_dim=pose_dim, n_words=n_words,
                                      n_speakers=N_SPEAKERS)
    variables = convert_hierarchical_generator(gen_t.state_dict())
    out_j, z_j, mu_j, _ = gen_j.apply(
        variables, jnp.asarray(pre_seq), jnp.asarray(in_text),
        jnp.asarray(audio_feat), jnp.asarray(vids),
        rng=jax.random.PRNGKey(0), train=False)

    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_torch_export_roundtrip_against_live_model(ref):
    """eval/torch_export_hop inverts the importer against the live
    reference model: converting the reference's OWN state_dict to flax and
    exporting it back reproduces every exported tensor bit-exactly, and
    the live model strict=False-loads the export with zero unexpected
    keys (missing = the frozen LLM + the two dead blocks only)."""
    from hop_tpu.eval.torch_export_hop import export_hop_state_dict

    model_t = _build_torch_hop(ref, llm_layers=2)
    sd = model_t.state_dict()
    cfg = _our_cfg(2)
    variables = convert_hop_model(sd, cfg)
    sd_out = export_hop_state_dict(variables, cfg)

    assert len(sd_out) > 80
    for k, v in sd_out.items():
        assert k in sd, f"exported key {k} unknown to the reference model"
        np.testing.assert_array_equal(
            np.asarray(v), sd[k].detach().cpu().numpy(), err_msg=k)

    res = model_t.load_state_dict(
        {k: ref.torch.as_tensor(np.asarray(v)) for k, v in sd_out.items()},
        strict=False)
    assert list(res.unexpected_keys) == []
    for k in res.missing_keys:
        # word_embeddings is the tied alias of the frozen BERT vocab
        # matrix (HOP.py:111) — frozen-LLM state like llm_model.*
        assert (k.startswith("llm_model.")
                or k == "word_embeddings"
                or k.startswith("audio_encoder.")
                or k.startswith("gwnet.residual_convs.")), k


def test_trainable_param_count_matches_live_reference(ref):
    """Our HOP carries exactly the reference's trainable parameters minus
    its two DEAD blocks: the always-built WavEncoder that the gwnet path
    never calls (HOP.py:93 vs :209-231) and gwnet's residual_convs that
    the gcn_bool=True path never uses. (run_ted.py:335's '41,035,635'
    comment does not match the reference's own code under its defaults —
    the measured count is 65,746,860.)"""
    torch = ref.torch
    model_t = _build_torch_hop(ref, llm_layers=2)
    torch_trainable = sum(p.numel() for p in model_t.parameters()
                          if p.requires_grad)
    dead = (sum(p.numel() for p in model_t.audio_encoder.parameters())
            + sum(p.numel() for p in model_t.gwnet.residual_convs.parameters()))

    cfg = _our_cfg(2)
    model_j = HOPModel(cfg, n_speakers=N_SPEAKERS)
    shapes = jax.eval_shape(lambda: model_j.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 36267)), jnp.zeros((1, 34, 128)),
        jnp.zeros((1, 34), jnp.int32), jnp.zeros((1, 16, 27)),
        jnp.zeros((1,), jnp.int32), rng=jax.random.PRNGKey(2), train=False))
    ours = sum(int(np.prod(l.shape)) for k, sub in shapes["params"].items()
               if k != "llm"
               for l in jax.tree_util.tree_leaves(sub))
    assert ours + dead == torch_trainable
    assert dead == 69728 + 33280


def test_train_iter_gan_step_parity(ref, monkeypatch):
    """train_eval/train_gan.py:13-103 (trimodal GAN step: pre-seq build,
    use_noisy_target=False D phase, G losses) vs train/gan.py — loss
    values of a full GAN-phase step from the reference's own code."""
    torch = ref.torch
    _patch_gaussians(monkeypatch, torch)
    _patch_permutations(monkeypatch, torch)
    _patch_flax_dropout(monkeypatch)
    from train_eval.train_gan import train_iter_gan
    from hop_tpu.train.gan import make_gan_train_steps

    cfg = _our_cfg(2)
    torch.manual_seed(3)
    spk = ref.vocab.Vocab("spk")
    for i in range(N_SPEAKERS - spk.n_words):
        spk.index_word(f"s{i}")
    targs = argparse.Namespace(n_pre_poses=4, n_poses=34,
                               input_context="both", hidden_size=300,
                               n_layers=4, dropout_prob=0.3,
                               freeze_wordembed=False, loss_warmup=10,
                               z_type="speaker",
                               loss_regression_weight=600.0,
                               loss_gan_weight=5.0, loss_kld_weight=0.6,
                               loss_reg_weight=0.4)
    n_words = 50
    gen_t = ref.mcn.PoseGenerator(targs, pose_dim=27, n_words=n_words,
                                  word_embed_size=300, word_embeddings=None,
                                  z_obj=spk).float()
    dis_t = ref.mcn.ConvDiscriminator(27).float()
    gen_t.train(), dis_t.train()
    _zero_dropout(torch, gen_t, dis_t)
    g_opt = torch.optim.Adam(gen_t.parameters(),
                             lr=cfg.train.learning_rate,
                             betas=cfg.train.betas)
    d_opt = torch.optim.Adam(
        dis_t.parameters(),
        lr=cfg.train.learning_rate * cfg.train.dis_lr_scale,
        betas=cfg.train.betas)

    gen_j = PoseGenerator(pose_dim=27, n_words=n_words,
                          n_speakers=N_SPEAKERS)
    dis_j = ConvDiscriminator()
    warmup_step, gan_step, init_state = make_gan_train_steps(
        cfg, gen_j, dis_j)
    state = init_state(convert_pose_generator(gen_t.state_dict()),
                       convert_conv_discriminator(dis_t.state_dict()))

    r = np.random.default_rng(13)
    B = 4
    target = (r.standard_normal((B, 34, 27)) * 0.1).astype(np.float32)
    in_text = r.integers(0, n_words, (B, 34)).astype(np.int64)
    in_audio = r.standard_normal((B, 36267)).astype(np.float32)
    vids = (np.arange(B) % N_SPEAKERS).astype(np.int64)
    batch = {"target_vec": jnp.asarray(target),
             "text_padded": jnp.asarray(in_text),
             "in_audio": jnp.asarray(in_audio),
             "vid_indices": jnp.asarray(vids)}

    for epoch, step in ((5, warmup_step), (12, gan_step)):
        ret = train_iter_gan(targs, epoch, torch.from_numpy(in_text),
                             torch.from_numpy(in_audio),
                             torch.from_numpy(target),
                             torch.from_numpy(vids),
                             gen_t, dis_t, g_opt, d_opt)
        state, metrics = gan_step(state, batch, jax.random.PRNGKey(epoch)) \
            if epoch > 10 else warmup_step(state, batch,
                                           jax.random.PRNGKey(epoch))
        want_keys = {"loss", "KLD", "DIV_REG"}
        if epoch > 10:
            want_keys |= {"gen", "dis"}
        assert set(ret) == want_keys
        # step 2 runs through both frameworks' Adam updates of step 1 —
        # looser for the same reasons as the HOP tests
        _assert_metrics_match(metrics, ret, rel=1e-4 if epoch == 5 else 2e-2)


def test_train_iter_embed_step_parity(ref, monkeypatch):
    """train_eval/train_joint_embed.py:5-52 (gesture_autoencoder mode:
    recon L1 per-sample mean summed over batch, no KLD) driven by the
    reference's own EmbeddingNet(mode='pose') vs train/embed.py."""
    torch = ref.torch
    _patch_flax_dropout(monkeypatch)
    import importlib
    en = importlib.import_module("model.embedding_net")
    from train_eval.train_joint_embed import train_iter_embed
    from hop_tpu.eval.torch_import import convert_embedding_net_pose
    from hop_tpu.models.embedding_net import EmbeddingNet
    from hop_tpu.train.embed import make_embed_train_step

    cfg = _our_cfg(2)
    torch.manual_seed(15)
    net_t = en.EmbeddingNet(argparse.Namespace(), pose_dim=27, n_frames=34,
                            n_words=50, word_embed_size=300,
                            word_embeddings=None, mode="pose").float()
    net_t.train()
    _zero_dropout(torch, net_t)
    opt_t = torch.optim.Adam(net_t.parameters(),
                             lr=cfg.train.learning_rate,
                             betas=cfg.train.betas)
    targs = argparse.Namespace(n_pre_poses=4, loss_regression_weight=600.0,
                               loss_kld_weight=0.6)

    net_j = EmbeddingNet(pose_dim=27, n_frames=34, n_words=50, mode="pose")
    step, init_state = make_embed_train_step(cfg, net_j, mode="pose")
    state = init_state(convert_embedding_net_pose(net_t.state_dict()))

    r = np.random.default_rng(16)
    target = (r.standard_normal((4, 34, 27)) * 0.1).astype(np.float32)
    batch = {"target_vec": jnp.asarray(target)}
    tt = torch.from_numpy(target)

    for i, rel in ((0, 1e-5), (1, 1e-4)):
        ret = train_iter_embed(targs, 5, None, None, tt, net_t, opt_t,
                               mode="pose")
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert float(metrics["loss"]) == pytest.approx(ret["loss"], rel=rel)


def test_train_iter_seq2seq_step_parity(ref, monkeypatch):
    """train_eval/train_seq2seq.py:6-51 (custom loss: 600*MSE +
    continuity - variance, grad clip 5) driven by the reference's own
    Seq2SeqNet vs train/seq2seq.py. Full-length sequences so torch's
    packed-sequence encoder equals our masked one."""
    torch = ref.torch
    _patch_flax_dropout(monkeypatch)
    import importlib
    sn = importlib.import_module("model.seq2seq_net")
    from train_eval.train_seq2seq import train_iter_seq2seq
    from hop_tpu.eval.torch_import_generator import convert_seq2seq
    from hop_tpu.models.seq2seq import Seq2SeqNet
    from hop_tpu.train.seq2seq import make_seq2seq_train_step

    cfg = _our_cfg(2)
    torch.manual_seed(21)
    targs = argparse.Namespace(hidden_size=200, n_layers=4,
                               dropout_prob=0.3, n_pre_poses=4,
                               GAN_noise_size=0,
                               loss_regression_weight=600.0,
                               loss_kld_weight=0.6, loss_reg_weight=0.4)
    n_words, T = 50, 12
    net_t = sn.Seq2SeqNet(targs, pose_dim=27, n_frames=34, n_words=n_words,
                          word_embed_size=300, word_embeddings=None).float()
    net_t.train()
    _zero_dropout(torch, net_t)
    opt_t = torch.optim.Adam(net_t.parameters(),
                             lr=cfg.train.learning_rate,
                             betas=cfg.train.betas)

    net_j = Seq2SeqNet(pose_dim=27, n_frames=34, n_pre_poses=4,
                       n_words=n_words, embed_size=300, hidden_size=200,
                       n_layers=4, dropout=0.3)
    step, init_state = make_seq2seq_train_step(cfg, net_j)
    state = init_state(convert_seq2seq(net_t.state_dict()))

    r = np.random.default_rng(22)
    B = 4
    text = r.integers(1, n_words, (B, T)).astype(np.int64)
    target = (r.standard_normal((B, 34, 27)) * 0.1).astype(np.float32)
    batch = {"word_seq": jnp.asarray(text),
             "text_mask": jnp.ones((B, T), jnp.float32),
             "target_vec": jnp.asarray(target)}

    for i, rel in ((0, 1e-5), (1, 1e-4)):
        ret = train_iter_seq2seq(
            targs, 5, torch.from_numpy(text).transpose(0, 1).transpose(0, 1),
            [T] * B, torch.from_numpy(target), net_t, opt_t)
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert float(metrics["loss"]) == pytest.approx(ret["loss"], rel=rel)


def test_train_iter_speech2gesture_step_parity(ref, monkeypatch):
    """train_eval/train_speech2gesture.py:5-37 (LS-GAN on motion
    differences) driven by the reference's own Generator/Discriminator
    (TF-SAME conv shims, bilinear make_1d, U-Net skips) vs
    train/speech2gesture.py."""
    torch = ref.torch
    import importlib
    s2g = importlib.import_module("model.speech2gesture")
    from train_eval.train_speech2gesture import train_iter_speech2gesture
    from hop_tpu.eval.torch_import_generator import (convert_s2g_generator,
                                                     convert_s2g_discriminator)
    from hop_tpu.models import speech2gesture as s2g_j
    from hop_tpu.train.speech2gesture import make_s2g_train_step

    # the reference pins torch 1.13; the installed torch 2.x validates
    # padding strings in the Conv constructor, which the shims pass
    # through ('SAME'/'VALID') but never use — their forward computes its
    # own padding. Construct with padding=0 and restore the string.
    def _tf_init(base):
        def init(self, *args, **kwargs):
            pad = kwargs.get("padding", "SAME")
            kw = dict(kwargs)
            kw["padding"] = 0
            base.__init__(self, *args, **kw)
            self.padding = pad
        return init

    monkeypatch.setattr(s2g.Conv1d_tf, "__init__",
                        _tf_init(torch.nn.Conv1d))
    monkeypatch.setattr(s2g.Conv2d_tf, "__init__",
                        _tf_init(torch.nn.Conv2d))

    cfg = _our_cfg(2)
    torch.manual_seed(31)
    gen_t = s2g.Generator(34, 27, 4).float()
    dis_t = s2g.Discriminator(27).float()
    gen_t.train(), dis_t.train()
    g_opt = torch.optim.Adam(gen_t.parameters(),
                             lr=cfg.train.learning_rate,
                             betas=cfg.train.betas)
    d_opt = torch.optim.Adam(
        dis_t.parameters(),
        lr=cfg.train.learning_rate * cfg.train.dis_lr_scale,
        betas=cfg.train.betas)
    targs = argparse.Namespace(n_pre_poses=4, loss_regression_weight=600.0,
                               loss_gan_weight=5.0)

    gen_j = s2g_j.Generator(n_poses=34, pose_dim=27, n_pre_poses=4)
    dis_j = s2g_j.Discriminator(pose_dim=27)
    step, init_state = make_s2g_train_step(cfg, gen_j, dis_j)
    state = init_state(convert_s2g_generator(gen_t.state_dict()),
                       convert_s2g_discriminator(dis_t.state_dict()))

    r = np.random.default_rng(32)
    B = 2
    spec = r.standard_normal((B, 128, 70)).astype(np.float32)
    target = (r.standard_normal((B, 34, 27)) * 0.1).astype(np.float32)
    batch = {"spectrogram": jnp.asarray(spec),
             "target_vec": jnp.asarray(target)}

    for i, rel in ((0, 1e-5), (1, 1e-2)):
        ret = train_iter_speech2gesture(
            targs, torch.from_numpy(spec), torch.from_numpy(target),
            gen_t, dis_t, g_opt, d_opt, torch.nn.L1Loss())
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert set(ret) == {"loss", "gen", "dis"}
        _assert_metrics_match(metrics, ret, rel=rel)


# ---------------------------------------------------------------------------
# evaluator parity (FGD / feature distance / diversity / recon-err)
# ---------------------------------------------------------------------------

def test_embedding_space_evaluator_ted_parity(ref, tmp_path, monkeypatch):
    """model/EmbeddingSpaceEvaluator.py:387-594 driven end-to-end: fabricate
    a gesture_autoencoder checkpoint with THEIR embedded EmbeddingNet
    (mode='pose'), load it in their evaluator (scipy.linalg.sqrtm) and in
    ours (eval/fgd.py, eigh sqrtm on device), push identical batches, and
    compare FGD, feature distance, recon-err-diff and the batch-block
    diversity score."""
    torch = ref.torch
    import importlib
    ese_mod = importlib.import_module("model.EmbeddingSpaceEvaluator")
    from hop_tpu.eval.torch_import import convert_embedding_net_pose
    from hop_tpu.eval.fgd import (EmbeddingSpaceEvaluator as OurESE,
                                  make_ted_feature_fn)
    from hop_tpu.models.embedding_net import EmbeddingNet as OurEmbeddingNet

    args = SimpleNamespace(n_pre_poses=4, n_poses=34, wordembed_dim=300,
                           pose_dim=27, datasets="TED")
    torch.manual_seed(11)
    src = ese_mod.EmbeddingNet(args, 27, 34, 100, 300, None, "pose")
    for m in src.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    path = tmp_path / "gesture_autoencoder_checkpoint_best.bin"
    torch.save({"pose_dim": 27, "gen_dict": src.state_dict()}, str(path))

    theirs = ese_mod.EmbeddingSpaceEvaluator(args, str(path), None, 100,
                                             "cpu")

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_embedding_net_pose(dict(src.state_dict())))
    net = OurEmbeddingNet(pose_dim=27, n_frames=34, n_words=100, mode="pose")
    ours = OurESE(make_ted_feature_fn(net, variables))

    r = np.random.default_rng(12)
    for _ in range(4):
        gen = (r.standard_normal((16, 34, 27)) * 0.1).astype(np.float32)
        real = (r.standard_normal((16, 34, 27)) * 0.1).astype(np.float32)
        with torch.no_grad():
            theirs.push_samples(None, None, torch.from_numpy(gen),
                                torch.from_numpy(real))
        ours.push_samples(jnp.asarray(gen), jnp.asarray(real))

    fd_t, feat_t = theirs.get_scores()
    fd_j, feat_j = ours.get_scores()
    np.testing.assert_allclose(fd_j, fd_t, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(feat_j, feat_t, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray([float(x) for x in ours._recon_err_diff]),
        np.asarray(theirs.recon_err_diff), rtol=1e-3, atol=1e-7)

    # diversity: shuffle granularity is whole BATCH blocks on both sides
    # (reference :498-508); pin both permutations to roll-by-one
    monkeypatch.setattr(torch, "randperm",
                        lambda n, **k: (torch.arange(n) + 1) % n)

    class _Perm:
        @staticmethod
        def permutation(n):
            return (np.arange(n) + 1) % n

    div_t = theirs.get_diversity_scores()
    div_j = ours.get_diversity_scores(rng=_Perm())
    np.testing.assert_allclose(div_j, div_t, rtol=1e-4)


def test_embedding_space_evaluator_expressive_parity(ref, tmp_path):
    """Expressive path (pose_dim 126): their evaluator loads MotionAE from
    ckpt['motion_ae'] (EmbeddingSpaceEvaluator.py:411-414); compare FGD +
    feature distance on identical pushed batches."""
    torch = ref.torch
    import importlib
    ese_mod = importlib.import_module("model.EmbeddingSpaceEvaluator")
    from model.motion_ae import MotionAE as RefMotionAE
    from hop_tpu.eval.torch_import import convert_motion_ae
    from hop_tpu.eval.fgd import (EmbeddingSpaceEvaluator as OurESE,
                                  make_expressive_feature_fn)
    from hop_tpu.models.motion_ae import MotionAE as OurMotionAE

    args = SimpleNamespace(n_pre_poses=4, n_poses=34, wordembed_dim=300,
                           pose_dim=126, datasets="expressive")
    torch.manual_seed(13)
    src = RefMotionAE(126, 32)
    for m in src.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    path = tmp_path / "expressive_eval_net.bin"
    torch.save({"pose_dim": 126, "latent_dim": 32,
                "motion_ae": src.state_dict()}, str(path))

    theirs = ese_mod.EmbeddingSpaceEvaluator(args, str(path), None, 100,
                                             "cpu")
    theirs.net.train(False)

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_motion_ae(dict(src.state_dict())))
    net = OurMotionAE(pose_dim=126, latent_dim=32)
    ours = OurESE(make_expressive_feature_fn(net, variables))

    r = np.random.default_rng(14)
    for _ in range(3):
        gen = (r.standard_normal((16, 34, 126)) * 0.1).astype(np.float32)
        real = (r.standard_normal((16, 34, 126)) * 0.1).astype(np.float32)
        with torch.no_grad():
            theirs.push_samples(None, None, torch.from_numpy(gen),
                                torch.from_numpy(real))
        ours.push_samples(jnp.asarray(gen), jnp.asarray(real))

    fd_t, feat_t = theirs.get_scores()
    fd_j, feat_j = ours.get_scores()
    np.testing.assert_allclose(fd_j, fd_t, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(feat_j, feat_t, rtol=1e-4)


# ---------------------------------------------------------------------------
# hierarchy (HA2G) loss-step parity
# ---------------------------------------------------------------------------

def test_train_iter_hierarchy_step_parity(ref, monkeypatch):
    """train_eval/train_hierarchy.py:71-293 — the 3-stage TED cascade with
    shared ResNetSE audio encoder, contrastive text/audio alignment and the
    physical angle prior — driven by the reference's own modules vs
    train/hierarchy.py. Covers one warmup step (epoch 0) and one full GAN
    step (epoch 11 > loss_warmup 10), i.e. value parity through the first
    Adam updates of all five reference optimizers (our single Adam over the
    combined tree is per-parameter identical)."""
    torch = ref.torch
    _patch_gaussians(monkeypatch, torch)
    _patch_permutations(monkeypatch, torch)
    _patch_flax_dropout(monkeypatch)

    import importlib
    hn = importlib.import_module("model.hierarchy_net")
    rse_mod = importlib.import_module("model.ResNetSE34V2")
    blocks_mod = importlib.import_module("model.ResNetBlocks")
    from train_eval.train_hierarchy import train_iter_hierarchy
    from hop_tpu.eval.torch_import_generator import (
        convert_hierarchical_generator, convert_conv_discriminator,
        convert_resnet_se, convert_text_encoder_tcn)
    from hop_tpu.models import hierarchy as H
    from hop_tpu.models.resnet_se import ResNetSE
    from hop_tpu.train.hierarchy import make_hierarchy_train_steps
    from hop_tpu import geometry

    cfg = ted_config()
    cfg = cfg.replace(loss=dataclasses.replace(
        cfg.loss, contrastive_pos_weight=0.1, contrastive_neg_weight=0.05,
        physical_weight=0.01))
    skel = cfg.data.skeleton
    n_words, B = 50, 2
    lr, betas = cfg.train.learning_rate, cfg.train.betas

    targs = argparse.Namespace(
        n_pre_poses=4, n_poses=34, input_context="both", hidden_size=300,
        n_layers=4, dropout_prob=0.3, freeze_wordembed=False,
        z_type="speaker", loss_warmup=10,
        loss_regression_weight=cfg.loss.regression_weight,
        loss_gan_weight=cfg.loss.gan_weight,
        loss_kld_weight=cfg.loss.kld_weight,
        loss_reg_weight=cfg.loss.reg_weight,
        loss_contrastive_pos_weight=cfg.loss.contrastive_pos_weight,
        loss_contrastive_neg_weight=cfg.loss.contrastive_neg_weight,
        loss_physical_weight=cfg.loss.physical_weight,
        # train_hierarchy.py:247 squeezes dim 1: (pose_dim, 1) layout
        mean_dir_vec=np.asarray(skel.mean_dir_vec,
                                dtype=np.float32).reshape(-1, 1))

    torch.manual_seed(17)
    spk = ref.vocab.Vocab("spk")
    for i in range(N_SPEAKERS - spk.n_words):
        spk.index_word(f"s{i}")

    bones = H.stage_bones("TED")
    gens_t = [hn.Hierarchical_PoseGenerator(
        targs, pose_dim=len(bn) * 3, n_words=n_words, word_embed_size=300,
        word_embeddings=None, z_obj=spk).float() for bn in bones]
    dis_t = hn.Hierarchical_ConvDiscriminator(27).float()
    rse_t = rse_mod.ResNetSE(
        targs, blocks_mod.SEBasicBlock, [3, 4, 6, 3], [32, 64, 128, 256],
        nOut=32, z_obj=spk, pose_level=3, n_mels=128).float()
    text_t = hn.TextEncoderTCN(targs, n_words, 300, None).float()

    class _Wav(torch.nn.Module):
        """Hierarchical_WavEncoder.forward (hierarchy_net.py:16-19): the
        wrapper only unsqueezes the mel channel before ResNetSE."""
        def __init__(self, net):
            super().__init__()
            self.net = net

        def forward(self, spec, vids):
            return self.net(spec.unsqueeze(1), vids)

    audio_t = _Wav(rse_t)
    for m in gens_t + [dis_t, audio_t, text_t]:
        m.train()
        _zero_dropout(torch, m)

    opts = [torch.optim.Adam(g.parameters(), lr=lr, betas=betas)
            for g in gens_t]
    dis_opt = torch.optim.Adam(
        dis_t.parameters(), lr=lr * cfg.train.dis_lr_scale, betas=betas)
    audio_opt = torch.optim.Adam(audio_t.parameters(), lr=lr, betas=betas)
    text_opt = torch.optim.Adam(text_t.parameters(), lr=lr, betas=betas)

    # ours, weights converted from the live modules
    stages = [H.HierarchicalPoseGenerator(
        pose_dim=len(bn) * 3, n_words=n_words, n_speakers=N_SPEAKERS)
        for bn in bones]
    disc_j = H.HierarchicalConvDiscriminator()
    audio_j = ResNetSE(n_speakers=N_SPEAKERS, pose_level=3)
    text_j = H.HierarchicalTextEncoder(n_words=n_words)

    gen_params, gen_stats = {}, {}
    rv = convert_resnet_se(rse_t.state_dict())
    gen_params["audio"] = rv["params"]
    gen_stats["audio"] = rv.get("batch_stats", {})
    gen_params["text"] = {
        "TextEncoderTCN_0": convert_text_encoder_tcn(text_t.state_dict(),
                                                     "")}
    gen_stats["text"] = {}
    for k, g in enumerate(gens_t):
        gv = convert_hierarchical_generator(g.state_dict())
        gen_params[f"g{k + 1}"] = gv["params"]
        gen_stats[f"g{k + 1}"] = gv.get("batch_stats", {})

    warmup_step, gan_step, init_state = make_hierarchy_train_steps(
        cfg, stages, disc_j, audio_j, text_j)
    state = init_state({"params": gen_params, "batch_stats": gen_stats},
                       convert_conv_discriminator(dis_t.state_dict()))

    r = np.random.default_rng(18)
    T = geometry.calc_spectrogram_length_from_motion_length(34, 15)
    spec = r.standard_normal((B, 128, T)).astype(np.float32)
    text = r.integers(0, n_words, (B, 34)).astype(np.int64)
    target = (r.standard_normal((B, 34, 27)) * 0.1).astype(np.float32)
    vids = (np.arange(B) % N_SPEAKERS).astype(np.int64)
    batch = {"spectrogram": jnp.asarray(spec),
             "text_padded": jnp.asarray(text),
             "target_vec": jnp.asarray(target),
             "vid_indices": jnp.asarray(vids)}

    def ref_step(epoch):
        return train_iter_hierarchy(
            targs, epoch, torch.from_numpy(text), torch.from_numpy(spec),
            torch.from_numpy(target), torch.from_numpy(vids),
            gens_t[0], gens_t[1], gens_t[2], dis_t, audio_t, text_t,
            opts[0], opts[1], opts[2], dis_opt, audio_opt, text_opt)

    # step 1: warmup (epoch 0 <= loss_warmup)
    ret = ref_step(0)
    state, metrics = warmup_step(state, batch, jax.random.PRNGKey(1))
    assert set(ret) == {"loss", "KLD", "DIV_REG", "c_pos", "c_neg", "phy"}
    _assert_metrics_match(metrics, ret, rel=2e-3)

    # step 2: full GAN step (epoch 11 > 10) through both Adam updates
    ret = ref_step(11)
    state, metrics = gan_step(state, batch, jax.random.PRNGKey(2))
    assert set(ret) == {"loss", "KLD", "DIV_REG", "gen", "dis",
                        "c_pos", "c_neg", "phy"}
    _assert_metrics_match(metrics, ret, rel=2e-2)


def test_train_iter_hierarchy_expressive_step_parity(ref, monkeypatch):
    """train_eval/train_hierarchy_expressive.py:124-484 — the 6-stage
    expressive cascade with its explicit per-joint slice routing, 41-pair
    physical prior incl. palm cross-product pseudo-bones, and contrastive
    alignment — driven by the reference's own modules vs train/hierarchy.py
    (dataset='expressive'). Small widths (hidden 64, 2 layers, ResNetSE
    (1,1,1,1)) keep the CPU step tractable; the routing tables, loss
    structure and constants are what this pins."""
    torch = ref.torch
    _patch_gaussians(monkeypatch, torch)
    _patch_permutations(monkeypatch, torch)
    _patch_flax_dropout(monkeypatch)

    import importlib
    hn = importlib.import_module("model.hierarchy_net")
    rse_mod = importlib.import_module("model.ResNetSE34V2")
    blocks_mod = importlib.import_module("model.ResNetBlocks")
    from train_eval.train_hierarchy_expressive import (
        train_iter_hierarchy_expressive)
    from hop_tpu.config import expressive_config
    from hop_tpu.eval.torch_import_generator import (
        convert_hierarchical_generator, convert_conv_discriminator,
        convert_resnet_se, convert_text_encoder_tcn)
    from hop_tpu.models import hierarchy as H
    from hop_tpu.models.resnet_se import ResNetSE
    from hop_tpu.train.hierarchy import make_hierarchy_train_steps
    from hop_tpu import geometry

    hidden, n_layers, rse_layers = 64, 2, (1, 1, 1, 1)
    cfg = expressive_config()
    cfg = cfg.replace(loss=dataclasses.replace(
        cfg.loss, contrastive_pos_weight=0.1, contrastive_neg_weight=0.05,
        physical_weight=0.01))
    skel = cfg.data.skeleton
    n_words, B = 50, 2
    lr, betas = cfg.train.learning_rate, cfg.train.betas

    targs = argparse.Namespace(
        n_pre_poses=4, n_poses=34, input_context="both",
        hidden_size=hidden, n_layers=n_layers, dropout_prob=0.3,
        freeze_wordembed=False, z_type="speaker", loss_warmup=10,
        loss_regression_weight=cfg.loss.regression_weight,
        loss_gan_weight=cfg.loss.gan_weight,
        loss_kld_weight=cfg.loss.kld_weight,
        loss_reg_weight=cfg.loss.reg_weight,
        loss_contrastive_pos_weight=cfg.loss.contrastive_pos_weight,
        loss_contrastive_neg_weight=cfg.loss.contrastive_neg_weight,
        loss_physical_weight=cfg.loss.physical_weight,
        mean_dir_vec=np.asarray(skel.mean_dir_vec,
                                dtype=np.float32).reshape(-1, 1))

    torch.manual_seed(19)
    spk = ref.vocab.Vocab("spk")
    for i in range(N_SPEAKERS - spk.n_words):
        spk.index_word(f"s{i}")

    bones = H.stage_bones("expressive")
    assert len(bones) == 6
    gens_t = [hn.Hierarchical_PoseGenerator(
        targs, pose_dim=len(bn) * 3, n_words=n_words, word_embed_size=300,
        word_embeddings=None, z_obj=spk).float() for bn in bones]
    dis_t = hn.Hierarchical_ConvDiscriminator(126).float()
    rse_t = rse_mod.ResNetSE(
        targs, blocks_mod.SEBasicBlock, list(rse_layers),
        [32, 64, 128, 256], nOut=32, z_obj=spk, pose_level=6,
        n_mels=128).float()
    text_t = hn.TextEncoderTCN(targs, n_words, 300, None).float()

    class _Wav(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.net = net

        def forward(self, spec, vids):
            return self.net(spec.unsqueeze(1), vids)

    audio_t = _Wav(rse_t)
    for m in gens_t + [dis_t, audio_t, text_t]:
        m.train()
        _zero_dropout(torch, m)

    opts = [torch.optim.Adam(g.parameters(), lr=lr, betas=betas)
            for g in gens_t]
    dis_opt = torch.optim.Adam(
        dis_t.parameters(), lr=lr * cfg.train.dis_lr_scale, betas=betas)
    audio_opt = torch.optim.Adam(audio_t.parameters(), lr=lr, betas=betas)
    text_opt = torch.optim.Adam(text_t.parameters(), lr=lr, betas=betas)

    stages = [H.HierarchicalPoseGenerator(
        pose_dim=len(bn) * 3, n_words=n_words, n_speakers=N_SPEAKERS,
        hidden_size=hidden, n_layers=n_layers) for bn in bones]
    disc_j = H.HierarchicalConvDiscriminator()
    audio_j = ResNetSE(n_speakers=N_SPEAKERS, pose_level=6,
                       layers=rse_layers)
    text_j = H.HierarchicalTextEncoder(n_words=n_words, hidden_size=hidden,
                                       n_layers=n_layers)

    gen_params, gen_stats = {}, {}
    rv = convert_resnet_se(rse_t.state_dict(), layers=rse_layers)
    gen_params["audio"] = rv["params"]
    gen_stats["audio"] = rv.get("batch_stats", {})
    gen_params["text"] = {
        "TextEncoderTCN_0": convert_text_encoder_tcn(
            text_t.state_dict(), "", n_levels=n_layers)}
    gen_stats["text"] = {}
    for k, g in enumerate(gens_t):
        gv = convert_hierarchical_generator(g.state_dict(),
                                            n_layers=n_layers,
                                            tcn_levels=n_layers)
        gen_params[f"g{k + 1}"] = gv["params"]
        gen_stats[f"g{k + 1}"] = gv.get("batch_stats", {})

    warmup_step, gan_step, init_state = make_hierarchy_train_steps(
        cfg, stages, disc_j, audio_j, text_j)
    state = init_state({"params": gen_params, "batch_stats": gen_stats},
                       convert_conv_discriminator(dis_t.state_dict()))

    r = np.random.default_rng(20)
    T = geometry.calc_spectrogram_length_from_motion_length(34, 15)
    spec = r.standard_normal((B, 128, T)).astype(np.float32)
    text = r.integers(0, n_words, (B, 34)).astype(np.int64)
    target = (r.standard_normal((B, 34, 126)) * 0.1).astype(np.float32)
    vids = (np.arange(B) % N_SPEAKERS).astype(np.int64)
    batch = {"spectrogram": jnp.asarray(spec),
             "text_padded": jnp.asarray(text),
             "target_vec": jnp.asarray(target),
             "vid_indices": jnp.asarray(vids)}

    def ref_step(epoch):
        return train_iter_hierarchy_expressive(
            targs, epoch, torch.from_numpy(text), torch.from_numpy(spec),
            torch.from_numpy(target), torch.from_numpy(vids),
            *gens_t, dis_t, audio_t, text_t,
            *opts, dis_opt, audio_opt, text_opt)

    ret = ref_step(0)
    state, metrics = warmup_step(state, batch, jax.random.PRNGKey(1))
    assert set(ret) == {"loss", "KLD", "DIV_REG", "c_pos", "c_neg", "phy"}
    _assert_metrics_match(metrics, ret, rel=2e-3)

    ret = ref_step(11)
    state, metrics = gan_step(state, batch, jax.random.PRNGKey(2))
    assert set(ret) == {"loss", "KLD", "DIV_REG", "gen", "dis",
                        "c_pos", "c_neg", "phy"}
    _assert_metrics_match(metrics, ret, rel=2e-2)


# ---------------------------------------------------------------------------
# evaluate_testset parity (loss / joint MAE / FGD / BC / diversity)
# ---------------------------------------------------------------------------

def test_evaluate_testset_live_parity(ref, tmp_path, monkeypatch):
    """Evaluate.py:50-291 driven end-to-end as the oracle: a fake generator
    feeds IDENTICAL outputs to their loop and ours, librosa.onset_detect is
    stubbed to return the SAME per-sample onset times our injected masks
    encode, and the same fabricated eval net scores both sides. Pins the
    motion-beat extraction (angle pairs, change-angle normalisation, strict
    local-minima + threshold rule), the onset-count-weighted BC
    accumulation, joint MAE after FK, L1, FGD and diversity."""
    torch = ref.torch
    import importlib

    class _AvgMeter:
        # recovered utils/average_meter API (SURVEY 2.8); harness-only —
        # the BC math under test is entirely inside Evaluate.py
        def __init__(self, name, fmt=":f"):
            self.reset()

        def reset(self):
            self.val = self.avg = self.sum = self.count = 0

        def update(self, val, n=1):
            self.val = val
            self.sum += val * n
            self.count += n
            self.avg = self.sum / self.count

    am_mod = types.ModuleType("utils.average_meter")
    am_mod.AverageMeter = _AvgMeter
    monkeypatch.setitem(sys.modules, "utils.average_meter", am_mod)

    acc_mod = types.ModuleType("accelerate")
    acc_mod.Accelerator = lambda *a, **k: SimpleNamespace()
    acc_mod.DeepSpeedPlugin = lambda *a, **k: None
    acc_mod.DistributedDataParallelKwargs = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, "accelerate", acc_mod)

    # Evaluate.py imports convert for the video path only; its own
    # module-level convert_dir_vec_to_pose (Evaluate.py:27-48) shadows the
    # imported one inside evaluate_testset
    conv_mod = types.ModuleType("convert")
    for name in ("resample_pose_seq", "convert_pose_seq_to_dir_vec",
                 "create_video_and_save", "convert_dir_vec_to_pose",
                 "get_words_in_time_range"):
        setattr(conv_mod, name, lambda *a, **k: None)
    monkeypatch.setitem(sys.modules, "convert", conv_mod)

    ev_mod = importlib.import_module("Evaluate")
    ese_mod = importlib.import_module("model.EmbeddingSpaceEvaluator")

    from hop_tpu.eval import beat as beat_mod
    from hop_tpu.eval import evaluate as our_eval
    from hop_tpu.eval.fgd import (EmbeddingSpaceEvaluator as OurESE,
                                  make_ted_feature_fn)
    from hop_tpu.eval.torch_import import convert_embedding_net_pose
    from hop_tpu.models.embedding_net import EmbeddingNet as OurEmbeddingNet
    from hop_tpu.ops import onset as onset_ops

    cfg = ted_config()
    B, n_batches, epoch = 8, 2, 40

    # shared fabricated eval net (as in the evaluator parity test)
    eargs = SimpleNamespace(n_pre_poses=4, n_poses=34, wordembed_dim=300,
                            pose_dim=27, datasets="TED")
    torch.manual_seed(23)
    src = ese_mod.EmbeddingNet(eargs, 27, 34, 100, 300, None, "pose")
    for m in src.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    path = tmp_path / "evalnet.bin"
    torch.save({"pose_dim": 27, "gen_dict": src.state_dict()}, str(path))
    theirs_ese = ese_mod.EmbeddingSpaceEvaluator(eargs, str(path), None, 100,
                                                 "cpu")
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_embedding_net_pose(dict(src.state_dict())))
    net = OurEmbeddingNet(pose_dim=27, n_frames=34, n_words=100, mode="pose")
    ours_ese = OurESE(make_ted_feature_fn(net, variables))

    # fixed data + fixed generator outputs
    r = np.random.default_rng(24)
    data = []
    outs = []
    for _ in range(n_batches):
        data.append({
            "text_padded": r.integers(0, 100, (B, 34)).astype(np.int64),
            "target_vec": (r.standard_normal((B, 34, 27)) * 0.1
                           ).astype(np.float32),
            "in_audio": r.standard_normal((B, 36267)).astype(np.float32),
            "log_mel": r.standard_normal((B, 34, 128)).astype(np.float32),
        })
        outs.append((r.standard_normal((B, 34, 27)) * 0.1
                     ).astype(np.float32))

    # injected onsets on our detector's frame grid, identical on both sides
    F = int(np.asarray(onset_ops.onset_detect_mask(
        jnp.zeros((1, 36267)))).shape[1])
    times = np.asarray(onset_ops.onset_frame_times(F))
    onset_masks = [r.random((B, F)) < 0.05 for _ in range(n_batches)]
    for m in onset_masks:
        m[:, 3] = True  # every sample keeps >= 1 onset (no div-by-zero)
    onset_by_audio = {}
    for bi, batch in enumerate(data):
        for b in range(B):
            onset_by_audio[batch["in_audio"][b].tobytes()] = (
                times[onset_masks[bi][b]])

    def fake_onset_detect(y=None, sr=16000, units="time"):
        return onset_by_audio[np.asarray(y, dtype=np.float32).tobytes()]

    monkeypatch.setattr(
        sys.modules["librosa"], "onset",
        SimpleNamespace(onset_detect=fake_onset_detect), raising=False)

    calls = {"n": 0}

    def patched_mask(audio, *a, **k):
        m = onset_masks[calls["n"] % n_batches]
        calls["n"] += 1
        return jnp.asarray(m)

    monkeypatch.setattr(beat_mod.onset_ops, "onset_detect_mask",
                        patched_mask)

    # their side
    class _FakeModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.i = 0

        def forward(self, in_audio, log_mel, in_text, pre_seq, vids):
            # copy: Evaluate.py's MAE block mutates `outputs` IN PLACE
            # through the shared .cpu().numpy() view (:260-261 does
            # `out_dir_vec = outputs.cpu().numpy(); out_dir_vec += mean`);
            # without the copy their loop would corrupt our source arrays
            out = torch.from_numpy(outs[self.i].copy())
            self.i += 1
            return out, None, None, None

    loader = []
    for batch in data:
        # same in-place hazard for target_vec (:265-266)
        t = {k: torch.from_numpy(v.copy()) for k, v in batch.items()}
        loader.append((None, None, t["text_padded"], t["text_padded"],
                       None, None, t["target_vec"], t["in_audio"],
                       t["log_mel"], None, None))

    monkeypatch.setattr(torch, "randperm",
                        lambda n, **k: (torch.arange(n) + 1) % n)
    targs = SimpleNamespace(datasets="TED")
    t_loss, t_mae, t_fgd, t_bc, t_div = ev_mod.evaluate_testset(
        loader, _FakeModel(), theirs_ese, epoch, None, targs)

    # our side
    out_iter = iter(outs)

    def generate_fn(batch, vids, rng):
        return jnp.asarray(next(out_iter))

    class _Perm:
        @staticmethod
        def permutation(n):
            return (np.arange(n) + 1) % n

    batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in data]
    res = our_eval.evaluate_testset(batches, generate_fn, ours_ese, epoch,
                                    cfg, N_SPEAKERS, jax.random.PRNGKey(0))
    j_div = ours_ese.get_diversity_scores(rng=_Perm())

    np.testing.assert_allclose(res.loss, t_loss, rtol=1e-5)
    np.testing.assert_allclose(res.mae, t_mae, rtol=1e-4)
    np.testing.assert_allclose(res.frechet_dist, t_fgd, rtol=1e-3,
                               atol=1e-6)
    np.testing.assert_allclose(res.bc, t_bc, rtol=1e-4)
    np.testing.assert_allclose(j_div, t_div, rtol=1e-4)
