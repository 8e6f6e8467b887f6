"""Train the FGD gesture autoencoder on Human3.6M.

The reference's TED FGD feature net was trained on Human3.6M windows
(checkpoint dir ``train_h36m_gesture_autoencoder``, run_ted.py:126; the
loader is data_loader/h36m_loader.py). This CLI reproduces that path:
``data_3d_h36m.npz`` -> Human36M windows (12 target joints, frontalised,
noise-augmented) -> EmbeddingNet(mode='pose') (TED, pose_dim 27) ->
checkpoint that `eval/export_eval_net` turns into an ``--eval-net``
artifact. (The expressive 43-joint FGD net cannot come from H36M —
train it with run_expressive --model gesture_autoencoder instead.)

Usage:
  python -m hop_tpu.cli.train_h36m_ae --npz data_3d_h36m.npz \
      --checkpoint-dir ./ck_h36m [--epochs 40] [--dataset TED]
  python -m hop_tpu.eval.export_eval_net --checkpoint-dir ./ck_h36m \
      --out evalnet.npz
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--npz", required=True,
                   help="h36m positions npz (reference h36m_loader.py:31 "
                        "format: positions_3d item dict)")
    p.add_argument("--dataset", default="TED", choices=("TED",),
                   help="H36M windows carry the 10-joint TED skeleton; the "
                        "expressive (43-joint) FGD net cannot be trained "
                        "from them — use run_expressive --model "
                        "gesture_autoencoder on gesture data instead")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--learning-rate", type=float, default=5e-4)
    p.add_argument("--checkpoint-dir", default="./ck_h36m")
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--augment", action=argparse.BooleanOptionalAction,
                   default=True, help="h36m noise augmentation "
                   "(h36m_loader.py:84-90); --no-augment disables")
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hop_tpu.config import ted_config
    from hop_tpu.data.h36m import Human36M
    from hop_tpu.utils.checkpoint import CheckpointManager

    cfg = ted_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, learning_rate=args.learning_rate,
        batch_size=args.batch_size))
    skel = cfg.data.skeleton

    payload = np.load(args.npz, allow_pickle=True)
    positions = payload["positions_3d"].item()
    train_ds = Human36M(positions, skel.mean_dir_vec, is_train=True,
                        augment=args.augment, n_poses=cfg.data.n_poses,
                        skeleton=skel, seed=args.seed)
    val_ds = Human36M(positions, skel.mean_dir_vec, is_train=False,
                      augment=False, n_poses=cfg.data.n_poses,
                      skeleton=skel, seed=args.seed)
    print(f"h36m windows: train {len(train_ds)}, val {len(val_ds)}")

    rngs = {"params": jax.random.PRNGKey(args.seed),
            "dropout": jax.random.PRNGKey(args.seed + 1)}
    sample = jnp.zeros((args.batch_size, cfg.data.n_poses,
                        cfg.data.pose_dim), jnp.float32)

    from hop_tpu.models.embedding_net import EmbeddingNet
    from hop_tpu.train.embed import make_embed_train_step
    net = EmbeddingNet(pose_dim=cfg.data.pose_dim,
                       n_frames=cfg.data.n_poses, n_words=4,
                       mode="pose")
    variables = jax.jit(lambda t: net.init(
        rngs, None, None, t[:, :cfg.data.n_pre_poses], t,
        input_mode="pose", rng=jax.random.PRNGKey(1), train=True))(
        sample)
    step, init_state = make_embed_train_step(cfg, net, mode="pose")

    state = init_state(variables)
    ckpt = CheckpointManager(args.checkpoint_dir)
    ckpt.metadata = {"model": "gesture_autoencoder", "source": "h36m",
                     "dataset": cfg.data.dataset}

    def batches(epoch):
        order = np.random.default_rng(args.seed + epoch).permutation(
            len(train_ds))
        for i in range(0, len(order) - args.batch_size + 1,
                       args.batch_size):
            vecs = np.stack([train_ds[j][1]
                             for j in order[i:i + args.batch_size]])
            yield {"target_vec": jnp.asarray(vecs)}

    best = float("inf")
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch)
        for i, b in enumerate(batches(epoch)):
            state, m = step(state, b, jax.random.fold_in(rng, i))
            losses.append(m["loss"])
        val_vecs = jnp.asarray(np.stack(
            [val_ds[j][1] for j in range(min(len(val_ds), 512))]))
        v = {"params": state.params, "batch_stats": state.stats}
        outs = net.apply(v, None, None,
                         val_vecs[:, :cfg.data.n_pre_poses], val_vecs,
                         input_mode="pose", variational=False,
                         train=False)
        recon = outs[-1]
        val = float(jnp.mean(jnp.abs(recon - val_vecs)))
        tr = float(jnp.mean(jnp.asarray([float(x) for x in losses])))
        print(f"epoch {epoch + 1}: train loss {tr:.4f} "
              f"val recon L1 {val:.4f} ({time.time() - t0:.1f}s)")
        if val < best:
            best = val
            ckpt.save(epoch, state, metadata={"loss": val, "epoch": epoch})
            print(f"  saved (best val recon {best:.4f})")
    print(f"done; export with: python -m hop_tpu.eval.export_eval_net "
          f"--checkpoint-dir {args.checkpoint_dir} --out evalnet.npz")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
