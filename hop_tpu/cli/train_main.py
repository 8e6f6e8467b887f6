"""Model-zoo dispatch + training main, shared by run_ted / run_expressive.

Covers the reference's model switch (run_ted.py:272-310) for all six
families: AD_LLM (HOP), multimodal_context, seq2seq, speech2gesture,
joint_embedding / gesture_autoencoder, hierarchy.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hop_tpu.config import Config
from hop_tpu.cli import common as C
from hop_tpu.train.loops import run_training
from hop_tpu.utils.checkpoint import CheckpointManager


def _init_rngs(seed):
    return {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1)}


def build_model_and_steps(cfg: Config, args, lang, n_speakers: int,
                          sample_batch: dict):
    """Returns (state, warmup_step, gan_step, generate_from_state)."""
    model_name = args.model
    rngs = _init_rngs(args.seed)
    b = sample_batch

    def P(variables):
        """Install pretrained word embeddings (--wordembed-path) into any
        vocab-shaped embedding tables, like the reference's
        nn.Embedding.from_pretrained (multimodal_context_net.py:38-44)."""
        w = getattr(lang, "word_embedding_weights", None)
        if w is None or getattr(args, "wordembed_path", None) is None:
            return variables
        from hop_tpu.utils.params import set_pretrained_embeddings
        variables, n = set_pretrained_embeddings(variables, w)
        print(f"loaded pretrained word embeddings into {n} table(s)")
        return variables
    if model_name == "AD_LLM":
        from hop_tpu.models.hop import HOPModel
        from hop_tpu.models.multimodal_context import ConvDiscriminator
        from hop_tpu.train.llm import make_hop_train_steps
        model = HOPModel(cfg, n_speakers=n_speakers)
        disc = ConvDiscriminator()
        gen_vars = jax.jit(lambda *a: model.init(
            rngs, *a, rng=jax.random.PRNGKey(1), train=True))(
            b["in_audio"], b["log_mel"], b["text_padded"],
            b["target_vec"][:, :cfg.data.n_seed_frames], b["vid_indices"])
        if getattr(args, "llm_weights", None):
            from hop_tpu.models.llm_weights import install_llm_params
            gen_vars = install_llm_params(
                gen_vars, args.llm_weights, cfg.llm,
                getattr(args, "hf_vocab", None))
            print(f"loaded pretrained {cfg.llm.model} backbone from "
                  f"{args.llm_weights}")
        n_trainable = sum(
            int(np.prod(np.shape(x)))
            for path, x in jax.tree_util.tree_leaves_with_path(
                gen_vars["params"])
            if not any(getattr(k, "key", None) == "llm" for k in path))
        print(f"Total parameters: {n_trainable}")
        dis_vars = jax.jit(lambda t: disc.init(rngs, t, train=True))(
            b["target_vec"])
        warmup, gan, init_state = make_hop_train_steps(cfg, model, disc)
        state = init_state(gen_vars, dis_vars)

        def generate(state, batch, vids, rng):
            out, *_ = model.apply(
                {"params": state.gen_params,
                 "batch_stats": state.gen_stats},
                batch["in_audio"], batch["log_mel"], batch["text_padded"],
                batch["target_vec"][:, :cfg.data.n_seed_frames], vids,
                rng=rng, train=False)
            return out
        return state, warmup, gan, jax.jit(generate, static_argnums=())

    if model_name == "multimodal_context":
        from hop_tpu.models.multimodal_context import (PoseGenerator,
                                                       ConvDiscriminator)
        from hop_tpu.train.gan import make_gan_train_steps, build_pre_seq
        gen = PoseGenerator(pose_dim=cfg.data.pose_dim, n_words=lang.n_words,
                            n_speakers=n_speakers,
                            hidden_size=cfg.baseline.hidden_size,
                            n_layers=cfg.baseline.n_layers,
                            dropout=cfg.baseline.dropout_prob,
                            input_context=cfg.baseline.input_context)
        disc = ConvDiscriminator()
        pre = build_pre_seq(b["target_vec"], cfg.data.n_pre_poses)
        gen_vars = jax.jit(lambda *a: gen.init(
            rngs, *a, rng=jax.random.PRNGKey(1), train=True))(
            pre, b["text_padded"], b["in_audio"], b["vid_indices"])
        gen_vars = P(gen_vars)
        dis_vars = jax.jit(lambda t: disc.init(rngs, t, train=True))(
            b["target_vec"])
        warmup, gan, init_state = make_gan_train_steps(cfg, gen, disc)
        state = init_state(gen_vars, dis_vars)

        def generate(state, batch, vids, rng):
            pre = build_pre_seq(batch["target_vec"], cfg.data.n_pre_poses)
            out, *_ = gen.apply(
                {"params": state.gen_params,
                 "batch_stats": state.gen_stats},
                pre, batch["text_padded"], batch["in_audio"], vids,
                rng=rng, train=False)
            return out
        return state, warmup, gan, jax.jit(generate)

    if model_name == "seq2seq":
        from hop_tpu.models.seq2seq import Seq2SeqNet
        from hop_tpu.train.seq2seq import make_seq2seq_train_step
        net = Seq2SeqNet(pose_dim=cfg.data.pose_dim,
                         n_frames=cfg.data.n_poses,
                         n_pre_poses=cfg.data.n_pre_poses,
                         n_words=lang.n_words,
                         embed_size=cfg.data.wordembed_dim,
                         hidden_size=cfg.baseline.hidden_size,
                         n_layers=cfg.baseline.n_layers,
                         dropout=cfg.baseline.dropout_prob)
        variables = jax.jit(lambda *a: net.init(rngs, *a, train=True))(
            b["word_seq"], b["text_mask"], b["target_vec"])
        variables = P(variables)
        step, init_state = make_seq2seq_train_step(cfg, net)
        state = init_state(variables)

        def generate(state, batch, vids, rng):
            v = {"params": state.params}
            if state.stats:
                v["batch_stats"] = state.stats
            return net.apply(v, batch["word_seq"], batch["text_mask"],
                             batch["target_vec"], train=False)
        return state, step, None, jax.jit(generate)

    if model_name == "speech2gesture":
        from hop_tpu.models import speech2gesture as s2g
        from hop_tpu.train.speech2gesture import make_s2g_train_step
        gen = s2g.Generator(n_poses=cfg.data.n_poses,
                            pose_dim=cfg.data.pose_dim,
                            n_pre_poses=cfg.data.n_pre_poses)
        disc = s2g.Discriminator(pose_dim=cfg.data.pose_dim)
        gen_vars = jax.jit(lambda *a: gen.init(rngs, *a, train=True))(
            b["spectrogram"], b["target_vec"][:, :cfg.data.n_pre_poses])
        dis_vars = jax.jit(lambda t: disc.init(rngs, t, train=True))(
            b["target_vec"])
        step, init_state = make_s2g_train_step(cfg, gen, disc)
        state = init_state(gen_vars, dis_vars)

        def generate(state, batch, vids, rng):
            return gen.apply(
                {"params": state.gen_params,
                 "batch_stats": state.gen_stats},
                batch["spectrogram"],
                batch["target_vec"][:, :cfg.data.n_pre_poses], False)
        return state, step, step, jax.jit(generate)

    if model_name == "gesture_autoencoder" and cfg.data.pose_dim != 27:
        # expressive FGD feature net is a MotionAE, not EmbeddingNet
        # (EmbeddingSpaceEvaluator.py:411-414); the reference only
        # *consumes* its checkpoint — here it is trainable end to end
        from hop_tpu.models.motion_ae import MotionAE
        from hop_tpu.train.embed import make_motion_ae_train_step
        net = MotionAE(pose_dim=cfg.data.pose_dim,
                       latent_dim=cfg.baseline.motion_ae_latent_dim)
        variables = jax.jit(lambda t: net.init(rngs, t, True))(
            b["target_vec"])
        step, init_state = make_motion_ae_train_step(cfg, net)
        state = init_state(variables)

        def generate(state, batch, vids, rng):
            recon, _ = net.apply(
                {"params": state.params, "batch_stats": state.stats},
                batch["target_vec"], False)
            return recon
        return state, step, None, jax.jit(generate)

    if model_name in ("joint_embedding", "gesture_autoencoder"):
        from hop_tpu.models.embedding_net import EmbeddingNet
        from hop_tpu.train.embed import make_embed_train_step
        mode = "random" if model_name == "joint_embedding" else "pose"
        net = EmbeddingNet(pose_dim=cfg.data.pose_dim,
                           n_frames=cfg.data.n_poses,
                           n_words=lang.n_words, mode=mode)
        variables = jax.jit(lambda *a: net.init(
            rngs, b["text_padded"] if mode != "pose" else None,
            b["in_audio"] if mode != "pose" else None, *a,
            input_mode="pose", rng=jax.random.PRNGKey(1), train=True))(
            b["target_vec"][:, :cfg.data.n_pre_poses], b["target_vec"])
        variables = P(variables)
        step, init_state = make_embed_train_step(cfg, net, mode="pose")
        state = init_state(variables)

        def generate(state, batch, vids, rng):
            outs = net.apply(
                {"params": state.params, "batch_stats": state.stats},
                None, None,
                batch["target_vec"][:, :cfg.data.n_pre_poses],
                batch["target_vec"], input_mode="pose", rng=rng, train=False)
            return outs[-1]
        return state, step, None, jax.jit(generate)

    if model_name == "hierarchy":
        from hop_tpu.models import hierarchy as H
        from hop_tpu.models.resnet_se import ResNetSE
        from hop_tpu.train.hierarchy import make_hierarchy_train_steps
        loss = dataclasses.replace(cfg.loss, contrastive_pos_weight=0.1,
                                   contrastive_neg_weight=0.05,
                                   physical_weight=0.01)
        cfg = cfg.replace(loss=loss)
        bones = H.stage_bones(cfg.data.dataset)
        stages = [H.HierarchicalPoseGenerator(
            pose_dim=len(bn) * 3, n_words=lang.n_words,
            n_speakers=n_speakers, hidden_size=cfg.baseline.hidden_size,
            n_layers=cfg.baseline.n_layers,
            dropout=cfg.baseline.dropout_prob) for bn in bones]
        disc = H.HierarchicalConvDiscriminator()
        audio_enc = ResNetSE(n_speakers=n_speakers, pose_level=len(bones))
        text_enc = H.HierarchicalTextEncoder(
            n_words=lang.n_words, hidden_size=cfg.baseline.hidden_size,
            n_layers=cfg.baseline.n_layers)

        gen_params, gen_stats = {}, {}
        av = audio_enc.init(rngs, b["spectrogram"], b["vid_indices"], True)
        gen_params["audio"] = av["params"]
        gen_stats["audio"] = av["batch_stats"]
        tv = text_enc.init(rngs, b["text_padded"], True)
        gen_params["text"] = tv["params"]
        gen_stats["text"] = tv.get("batch_stats", {})
        blends = [jnp.zeros((b["target_vec"].shape[0], cfg.data.n_poses, 32))
                  ] * len(bones)
        for k, (stage, bn) in enumerate(zip(stages, bones)):
            tk = H.slice_target(b["target_vec"], bn)
            pre = H.route_pre_seq(tk, None, bn, None, cfg.data.n_pre_poses)
            sv = stage.init(rngs, pre, b["text_padded"], blends[k],
                            b["vid_indices"], rng=jax.random.PRNGKey(5),
                            train=True)
            gen_params[f"g{k+1}"] = sv["params"]
            gen_stats[f"g{k+1}"] = sv.get("batch_stats", {})
        dis_vars = disc.init(rngs, b["target_vec"], train=True)

        warmup, gan, init_state = make_hierarchy_train_steps(
            cfg, stages, disc, audio_enc, text_enc)
        state = init_state(P({"params": gen_params,
                              "batch_stats": gen_stats}), dis_vars)

        def generate(state, batch, vids, rng):
            _, _, _, _, blends = audio_enc.apply(
                {"params": state.gen_params["audio"],
                 "batch_stats": state.gen_stats["audio"]},
                batch["spectrogram"], vids, False)
            prev, prev_bones = None, None
            out = None
            for k, (stage, bn) in enumerate(zip(stages, bones)):
                tk = H.slice_target(batch["target_vec"], bn)
                pre = H.route_pre_seq(tk, prev, bn, prev_bones,
                                      cfg.data.n_pre_poses,
                                      tail_bones=H.routing_tail(
                                          cfg.data.dataset))
                rng, rk = jax.random.split(rng)
                out, *_ = stage.apply(
                    {"params": state.gen_params[f"g{k+1}"],
                     "batch_stats": state.gen_stats[f"g{k+1}"]},
                    pre, batch["text_padded"], blends[k], vids,
                    rng=rk, train=False)
                prev, prev_bones = out, bn
            return out
        return state, warmup, gan, jax.jit(generate)

    raise ValueError(f"unknown model {model_name}")


def train_main(cfg: Config, args) -> float:
    cfg = C.apply_overrides(cfg, args)
    train_ds, val_ds, lang = C.load_datasets(cfg, args)
    n_speakers = max(train_ds.speaker_model.n_words, 1)
    bs = min(cfg.train.batch_size, len(train_ds))
    print(f"train samples: {len(train_ds)}, val: {len(val_ds)}, "
          f"speakers: {n_speakers}, batch: {bs}")

    sample = C.device_batch(train_ds.make_batch(np.arange(bs)), cfg)
    state, warmup, gan, generate = build_model_and_steps(
        cfg, args, lang, n_speakers, sample)

    evaluator = C.make_fgd_evaluator(cfg, lang.n_words, args.eval_net)
    eval_fn = C.make_eval_fn(cfg, val_ds, evaluator, generate, n_speakers,
                             prefetch=getattr(args, "prefetch", 0))
    ckpt = CheckpointManager(args.checkpoint_dir)

    batch_keys = C.MODEL_BATCH_KEYS.get(args.model)

    def train_batches(epoch):
        for hb in train_ds.batches(bs, shuffle=True, seed=args.seed + epoch):
            yield C.device_batch(hb, cfg, keys=batch_keys)

    ckpt.metadata = {"model": args.model, "dataset": cfg.data.dataset,
                     "n_speakers": n_speakers, "n_words": lang.n_words,
                     "llm_model": cfg.llm.model,
                     "llm_layers": cfg.llm.n_layers,
                     "llm_weights": getattr(args, "llm_weights", None)}

    start_epoch, best_fgd = 0, float("inf")
    if getattr(args, "resume", False) and ckpt.latest_step() is not None:
        from hop_tpu.utils.checkpoint import strip_frozen, reattach_frozen
        stripped, frozen = strip_frozen(state)
        try:
            restored = ckpt.restore(template=stripped)
            state = reattach_frozen(restored["state"], frozen)
        except Exception:
            # older checkpoints stored the frozen LLM subtree too
            restored = ckpt.restore(template=state)
            state = restored["state"]
        meta = ckpt.run_metadata()
        start_epoch = int(meta.get("epoch", ckpt.latest_step())) + 1
        best_fgd = float(meta.get("best_fgd", float("inf")))
        print(f"resumed from checkpoint epoch {start_epoch - 1} "
              f"(best FGD {best_fgd:.4f})")

    # optional SPMD: shard the batch over a 'data' axis (and the frozen LLM
    # kernels over 'model' when requested); the jitted steps are layout
    # -polymorphic, XLA inserts the gradient psums.
    n_dev = len(jax.devices())
    n_mp = max(getattr(args, "model_parallel", 1), 1)
    n_dcn = max(getattr(args, "dcn_slices", 1), 1)
    n_dp = getattr(args, "data_parallel", 0)
    if n_dp == 0:
        n_dp = n_dev // (n_mp * n_dcn) if n_dev > 1 else 1
    mesh_ctx = None
    if n_dp * n_mp * n_dcn > 1:
        from hop_tpu.parallel import create_mesh, shard_state, shard_batch
        mesh = create_mesh(n_dp, n_mp, n_dcn=n_dcn)
        # ZeRO-2 analog on by default, like the reference's DeepSpeed
        # plugin (run_ted.py:110-112): Adam moments sharded over 'data'
        zero2 = not getattr(args, "no_zero2", False) and n_dp > 1
        axes = f"data={n_dp} x model={n_mp}"
        if n_dcn > 1:
            axes = f"dcn={n_dcn} x " + axes
        print(f"mesh: {axes}"
              + (" (zero2 opt-state sharding)" if zero2 else ""))
        state = shard_state(state, mesh, zero2=zero2)
        mesh_ctx = mesh
        inner_batches = train_batches

        def train_batches(epoch):  # noqa: F811
            for db in inner_batches(epoch):
                yield shard_batch(db, mesh)

    import contextlib
    with (mesh_ctx if mesh_ctx is not None else contextlib.nullcontext()):
        from hop_tpu.utils.prng import train_key
        state, best_fgd = run_training(
            cfg, train_batches, warmup, gan, state,
            rng=train_key(args.seed),
            eval_fn=eval_fn, checkpoint_manager=ckpt,
            metric_path=args.metrics,
            tensorboard_dir=getattr(args, "tensorboard_dir", None),
            log_every=args.log_every,
            start_epoch=start_epoch, best_fgd=best_fgd,
            checkpoint_every=getattr(args, "checkpoint_every", 1),
            profile_dir=getattr(args, "profile_dir", None),
            transfer_guard=getattr(args, "transfer_guard", "off"),
            prefetch=getattr(args, "prefetch", 0))
    return best_fgd
