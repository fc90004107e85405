"""Library-level training / evaluation loops.

The reference keeps its loop inline in a CLI monolith (train.py:116-240,
SURVEY.md §1 notes there is no library train()); here the loops are library
functions the CLI scripts call, so they are testable and reusable.

Console/TB surface parity:
- per-batch line 'Training Epoch:{e} [{seen}/{total}] Lr:… Loss:… Beta1:…'
  (train.py:136-144),
- per-epoch per-class IoU/acc dumps + 'Mean_iou'/'All_acc' (train.py:200-209)
  — computed from the epoch-level confusion matrix, which fixes the
  reference's mis-normalized running sums (SURVEY.md §2.5.5),
- TB scalars Train/LearningRate, Train/Beta1, Test/mIOU, Test/Acc,
  Test/Loss, last-layer grad norms, parameter histograms,
- best/regular checkpoints with SAVE_EPOCH cadence; the best-IoU tracker is
  NOT reset every epoch (fixes SURVEY.md §2.5.4).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_camvid_tpu.config import settings as default_settings
from pytorch_camvid_tpu.data.augment import (
    AugmentConfig, make_train_augment, make_eval_normalize)
from pytorch_camvid_tpu.data.pipeline import DeviceDataLoader
from pytorch_camvid_tpu.models import get_model
from pytorch_camvid_tpu.ops.metrics import (
    accuracy_from_confusion, iou_from_confusion)
from pytorch_camvid_tpu.parallel import (
    make_mesh, jit_train_step, jit_eval_step, batch_sharding,
    replicated_sharding)
from pytorch_camvid_tpu.train import (
    TrainState, adamw, make_train_step, make_eval_step, onecycle_lr,
    onecycle_beta1)
from pytorch_camvid_tpu.train.checkpoint import (
    checkpoint_name, get_weight_path, load_checkpoint, parse_epoch,
    save_checkpoint)


@dataclass
class TrainConfig:
    net: str = "unet"
    batch_size: int = 10          # train.py:22 default
    lr: float = 5e-4              # train.py:24
    epochs: int = 120             # train.py:26
    weight_decay: float = 0.0     # train.py:27
    resume: bool = False
    seed: int = 0
    compute_dtype: str = "float32"
    data_parallel: int = 0        # 0 = all local devices
    checkpoint_dir: Optional[str] = None
    log_dir: Optional[str] = None
    class_weights: Optional[Sequence[float]] = None
    loss_ignore_index: Optional[int] = None  # reference default: None
    quiet: bool = False
    save_epoch: int = 10
    # 'device': whole split HBM-resident, on-device batch gather (default);
    # 'host': host-RAM arrays with the native threaded gather + double-
    # buffered H2D (for splits larger than HBM; train.py -loader host)
    loader: str = "device"
    # split each batch into this many sequential microbatches (lax.scan):
    # ~grad_accum-fold lower activation memory at the same effective batch
    grad_accum: int = 1
    # checkpoint each model stage (jax.checkpoint): backward recomputes
    # stage activations instead of storing them — lower activation memory
    # with FULL-batch BN statistics (grad_accum's are per-microbatch)
    remat: bool = False
    # stop with a clear error when the loss goes NaN/Inf (SURVEY.md §5.3:
    # the reference's only fault detection is lr_finder's divergence stop)
    nan_guard: bool = True
    # act as if SIGTERM arrived after exactly this many applied batches:
    # deterministic preemption for bounded smoke runs and for testing the
    # mid-epoch step-exact resume path (None = only real SIGTERM stops)
    stop_after_batches: Optional[int] = None
    # dispatch this many train steps per host round-trip: the batch gather
    # + step are chained in ONE lax.scan XLA program over per-step index
    # vectors (the HBM-resident pipeline's design point). 1 = one dispatch
    # per step like the reference loop (train.py:122-144) — which through a
    # remote-attached device runs ~2.7x slower than the compute floor.
    # Identical semantics either way (numerics to float reduction order);
    # device loader only.
    dispatch_chain: int = 8


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def _pad_batch(images, labels, to_size: int, sentinel: int = 255):
    n = images.shape[0]
    if n == to_size:
        return images, labels
    pad = to_size - n
    images = jnp.concatenate(
        [images, jnp.zeros((pad,) + images.shape[1:], images.dtype)])
    labels = jnp.concatenate(
        [labels, jnp.full((pad,) + labels.shape[1:], sentinel,
                          jnp.int32 if labels.dtype == jnp.int32
                          else labels.dtype)])
    return images, labels


def evaluate(state, eval_fn, loader: DeviceDataLoader, normalize,
             batch_size: int, sharding=None):
    """Run the eval loop; returns (batch_loss_sum, confusion_matrix,
    n_batches).

    The reference reports eval loss as the per-batch-mean sum divided by the
    number of *batches* (eval.py:68: test_loss / len(valid_loader)) — callers
    divide ``batch_loss_sum / n_batches`` to match.

    TPU-native pipelining (VERDICT r2 weak #3): the loss sum and confusion
    matrix accumulate ON DEVICE across the epoch and cross to the host
    ONCE at the end — per-batch ``float(loss)`` syncs serialized every
    dispatch against a (remote) device and were pure round-trip tax. The
    eval epoch is one async dispatch stream.

    The device accumulator is int32: per-batch cells are exact small counts
    and int32 addition stays exact to 2^31 pixels per cell (float32 would
    round past 2^24 — e.g. VOC val is ~271M pixels); the host converts the
    final matrix to float64.

    Final ragged batches are padded with label-255 sentinels which the
    confusion matrix and (ignore-aware) loss both drop; under data
    parallelism the padded batch is pinned to ``sharding``.
    """
    loss_sum = None
    cm_sum = None
    n_batches = 0
    for images, labels in loader.epoch(0):
        if images.shape[0] != batch_size:
            images, labels = _pad_batch(images, labels.astype(jnp.int32),
                                        batch_size)
            if sharding is not None:
                images = jax.device_put(images, sharding)
                labels = jax.device_put(labels, sharding)
        x = normalize(images)
        loss, cm = eval_fn(state, (x, labels.astype(jnp.int32)))
        cm = cm.astype(jnp.int32)
        loss_sum = loss if loss_sum is None else loss_sum + loss
        cm_sum = cm if cm_sum is None else cm_sum + cm
        n_batches += 1
    if n_batches == 0:
        return 0.0, None, 0
    # the epoch's single device->host transfer
    return float(loss_sum), np.asarray(cm_sum).astype(np.float64), n_batches


def print_epoch_metrics(cm: np.ndarray, class_names: Sequence[str],
                        ignore_index: int, quiet=False):
    """Per-class IoU/acc + mean IoU / all-acc (train.py:200-209 surface,
    correctly normalized). Returns (miou, all_acc)."""
    iou = np.asarray(iou_from_confusion(jnp.asarray(cm)))
    all_acc, acc = accuracy_from_confusion(jnp.asarray(cm))
    all_acc = float(all_acc)
    acc = np.asarray(acc)
    keep = [i for i in range(len(class_names)) if i != ignore_index]
    miou = float(np.nanmean(iou[keep]))
    if not quiet:
        print("Iou for each class:")
        print(", ".join(f"{n}:{i:.4f}" for n, i in zip(class_names, iou)))
        print(f"Mean_iou {miou:.4f}")
        print("Acc for each class:")
        print(", ".join(f"{n}:{a:.4f}" for n, a in zip(class_names, acc)))
        print(f"All_acc {all_acc:.4f}")
    return miou, all_acc


def run_training(cfg: TrainConfig, train_ds, val_ds,
                 settings=default_settings, logger=None):
    """Full training run (reference train.py:116-240). train_ds/val_ds must
    expose .images/.labels (packed uint8), .class_num, .ignore_index,
    .class_names."""
    dtype = _dtype(cfg.compute_dtype)
    mesh = make_mesh(cfg.data_parallel if cfg.data_parallel > 0 else None)
    ndev = mesh.shape["data"]
    if cfg.batch_size % ndev:
        raise ValueError(f"batch size {cfg.batch_size} must divide over "
                         f"{ndev} devices")

    # multi-process (multi-host) runs: every process executes the SAME
    # SPMD program order over the global mesh (jax.devices() is global);
    # host-side writes — console, TB, checkpoints — happen on process 0
    # only. The loader seed contract makes every process compute identical
    # permutations, so no index broadcast is needed.
    nproc = jax.process_count()
    primary = jax.process_index() == 0
    had_logger = logger is not None
    if nproc > 1:
        if cfg.loader == "host":
            raise ValueError(
                "-loader host is single-process only; multi-host runs use "
                "the device loader (each host feeds its local shards)")
        if logger is not None and not primary:
            logger = None
    quiet = cfg.quiet or not primary

    init_fn, apply_fn = get_model(cfg.net, 3, train_ds.class_num)
    variables = init_fn(jax.random.PRNGKey(cfg.seed))
    opt = adamw(weight_decay=cfg.weight_decay)
    state = TrainState.create(variables, opt,
                              rng=jax.random.PRNGKey(cfg.seed + 1))

    # no sharding pinning on a single device: committed NamedSharding
    # arrays (and sharded-jit annotations) measured 4x slower through the
    # axon backend (PERF.md round-3); multi-device keeps explicit layouts
    rep = replicated_sharding(mesh) if ndev > 1 else None
    bsh = batch_sharding(mesh) if ndev > 1 else None
    if cfg.loader == "host":
        from pytorch_camvid_tpu.data.pipeline import HostLoader
        train_loader = HostLoader(np.asarray(train_ds.images),
                                  np.asarray(train_ds.labels),
                                  cfg.batch_size, shuffle=True,
                                  seed=cfg.seed, drop_last=True,
                                  sharding=bsh)
        val_loader = HostLoader(np.asarray(val_ds.images),
                                np.asarray(val_ds.labels),
                                cfg.batch_size, sharding=bsh)
    else:
        train_loader = DeviceDataLoader(train_ds.images, train_ds.labels,
                                        cfg.batch_size, shuffle=True,
                                        seed=cfg.seed, drop_last=True,
                                        sharding=bsh)
        val_loader = DeviceDataLoader(val_ds.images, val_ds.labels,
                                      cfg.batch_size, sharding=bsh,
                                      pad_to_batch=nproc > 1)

    steps_per_epoch = len(train_loader)
    if steps_per_epoch == 0:
        raise ValueError(
            f"batch size {cfg.batch_size} exceeds the train split "
            f"({train_ds.images.shape[0]} images) — no full batch to train "
            "on (training drops the last partial batch)")
    total_steps = steps_per_epoch * cfg.epochs

    aug_cfg = AugmentConfig(mean=settings.MEAN, std=settings.STD,
                            rotation_fill=train_ds.ignore_index,
                            scale_fill=train_ds.ignore_index)
    augment = make_train_augment(aug_cfg, compute_dtype=dtype)
    normalize = make_eval_normalize(settings.MEAN, settings.STD, dtype)

    cw = (jnp.asarray(cfg.class_weights, jnp.float32)
          if cfg.class_weights is not None else None)
    loss_ignore = cfg.loss_ignore_index
    if loss_ignore is None and train_ds.ignore_index is not None \
            and train_ds.ignore_index >= train_ds.class_num:
        # out-of-range ignore labels (VOC's 255) MUST be excluded from the
        # loss — take_along_axis would clamp them onto the last class and
        # silently train padding/void pixels toward it. CamVid's in-range
        # Void (11) stays trained like the reference (SURVEY.md §2.5.3).
        loss_ignore = train_ds.ignore_index
    step = make_train_step(apply_fn, opt, onecycle_lr(cfg.lr, total_steps),
                           onecycle_beta1(total_steps), class_weights=cw,
                           ignore_index=loss_ignore,
                           augment_fn=augment, compute_dtype=dtype,
                           grad_accum=cfg.grad_accum, remat=cfg.remat)
    use_chain = cfg.dispatch_chain > 1 and cfg.loader == "device"
    if use_chain:
        from pytorch_camvid_tpu.parallel import jit_chain_train_step
        chain_step = jit_chain_train_step(step, mesh)
    train_step = jit_train_step(step, mesh) if not use_chain else None
    # the eval loss must drop the ragged-batch pad sentinel 255 AND whatever
    # the training loss ignores, so Test/Loss measures the same objective
    eval_loss_ignore = {255} | ({loss_ignore} if loss_ignore is not None
                                else set())
    eval_step = jit_eval_step(
        make_eval_step(apply_fn, train_ds.class_num,
                       ignore_index=train_ds.ignore_index,
                       class_weights=cw,
                       loss_ignore_index=tuple(eval_loss_ignore),
                       compute_dtype=dtype), mesh)

    if logger is not None and cfg.log_dir:
        # the reference logs the model graph to TB once per run
        # (train.py:97-98 via utils.visualize_network, utils.py:10-13);
        # the TPU-native equivalents: a param/shape table as TB text plus
        # the jitted train step's StableHLO module in the run dir
        try:
            import os
            from pytorch_camvid_tpu.utils.summary import (
                visualize_network, dump_program)
            visualize_network(logger, state.variables(), cfg.net)
            img_sd = jax.ShapeDtypeStruct(
                (cfg.batch_size,) + tuple(train_ds.images.shape[1:]),
                train_ds.images.dtype)
            lbl_sd = jax.ShapeDtypeStruct(
                (cfg.batch_size,) + tuple(train_ds.labels.shape[1:]),
                train_ds.labels.dtype)
            dump_program(
                train_step if train_step is not None else jax.jit(step),
                (state, (img_sd, lbl_sd)),
                os.path.join(cfg.log_dir,
                             f"program_{cfg.net}.stablehlo.txt"))
        except Exception as e:  # a graph-dump failure must not kill a run
            if not quiet:
                print(f"program dump skipped: {e}")

    if rep is not None:
        from pytorch_camvid_tpu.parallel import put_global_tree
        state = put_global_tree(state, rep)

    trained_epochs = 0
    resume_epoch = 0      # epoch a preemption interrupted (0 = none)
    resume_skip = 0       # batches of that epoch already applied
    if cfg.resume and cfg.checkpoint_dir:
        import os
        weight_path = get_weight_path(os.path.dirname(cfg.checkpoint_dir))
        if weight_path:
            print(f"Loading weight file: {weight_path}...")
            if weight_path.endswith(".pth"):
                # reference torch checkpoint: params/BN only (the reference
                # never saves optimizer state, train.py:234)
                from pytorch_camvid_tpu.interop import load_torch_checkpoint
                v = load_torch_checkpoint(weight_path, cfg.net,
                                          state.variables())
                trained_epochs = parse_epoch(weight_path)
                # fast-forward the schedule like train.py:114 (.pth has no
                # step counter; our .npz checkpoints restore it exactly)
                state = TrainState(params=v["params"],
                                   bn_state=v["state"],
                                   opt_state=state.opt_state,
                                   step=jnp.asarray(
                                       trained_epochs * steps_per_epoch,
                                       jnp.int32),
                                   rng=state.rng)
                if rep is not None:
                    from pytorch_camvid_tpu.parallel import put_global_tree
                    state = put_global_tree(state, rep)
            else:
                state, meta = load_checkpoint(weight_path, state,
                                              sharding=rep)
                trained_epochs = meta.get("epoch",
                                          parse_epoch(weight_path))
                # mid-epoch preemption save: resume the interrupted epoch
                # at the first un-applied batch — the loader permutation is
                # seed+epoch deterministic, and state.step was saved exactly,
                # so this is step-exact (no schedule double-stepping)
                resume_epoch = meta.get("preempted_in_epoch", 0)
                resume_skip = meta.get("resume_batch_idx", 0)
            print("Done loading!")

    ckpt_dir = cfg.checkpoint_dir if primary else None
    best_iou = 0.0  # NOT reset per epoch (fixes SURVEY.md §2.5.4)
    history = []
    n_train = train_ds.images.shape[0]

    # graceful preemption: on SIGTERM save an emergency checkpoint under a
    # distinct '<epoch>-preempt' name (never clobbers a clean end-of-epoch
    # save) recording the first un-applied batch index, so `-resume`
    # restarts step-exactly mid-epoch (SURVEY.md §5.3: the reference's only
    # recovery is manual -resume from the last cadence checkpoint).
    import signal
    stop = {"flag": False}
    prev_handler = None
    try:
        prev_handler = signal.signal(
            signal.SIGTERM, lambda *_: stop.update(flag=True))
    except ValueError:
        pass  # not the main thread (e.g. under a test runner)

    # quiet runs with no logger sync metrics to host only every 16 steps
    # (keeps >1-step dispatch depth through a high-latency remote device);
    # interactive/logged runs sync one step behind, every step
    # the sync cadence must be IDENTICAL on every process: a process-local
    # cadence desynchronizes the nan_guard abort step, and surviving
    # processes then dispatch collective train steps the aborted one never
    # joins (pod hang). Multi-process: cfg.quiet alone decides (the logger
    # exists only on the primary); single-process: original semantics.
    sync_every = 16 if (cfg.quiet and (nproc > 1 or not had_logger)) else 1

    applied = 0  # batches applied this run (drives stop_after_batches)
    try:
        for epoch in range(trained_epochs + 1, cfg.epochs + 1):
            start = time.time()

            # per-batch console/TB reporting runs ONE step behind the
            # device: syncing step t's loss before dispatching t+1
            # serializes dispatch against the (remote) device and costs ~3x
            # wall-time per epoch; printing t-1's line while t executes
            # keeps the exact reference console surface (train.py:136-144)
            # with the sync overlapped.
            pending = None  # metrics awaiting print, one dispatch behind

            def emit(b_idx, seen, m):
                """Console/TB for one step, from host floats."""
                loss = m["loss"]
                if cfg.nan_guard and not np.isfinite(loss):
                    raise FloatingPointError(
                        f"loss diverged to {loss} at epoch {epoch} step "
                        f"{b_idx} — lower the lr or inspect the data (NaN "
                        "guard; disable with nan_guard=False)")
                if not quiet:
                    print("Training Epoch:{epoch} [{seen}/{total}] "
                          "Lr:{lr:0.6f} Loss:{loss:0.4f} Beta1:{beta:0.4f}"
                          .format(epoch=epoch, seen=seen, total=n_train,
                                  lr=float(m["lr"]), loss=loss,
                                  beta=float(m["beta1"])))
                if logger is not None:
                    n_iter = (epoch - 1) * steps_per_epoch + b_idx + 1
                    logger.last_layer_grad_norms(m, n_iter)

            def report(item):
                # ONE device->host transfer for all metric scalars of the
                # pending dispatch (one step, or a whole k-step chain):
                # each float() is a separate round-trip through a
                # remote-attached device
                b0, m, kk = item
                keys = list(m.keys())
                vals = np.asarray(jnp.stack([m[k] for k in keys]))
                vals = vals.reshape(len(keys), -1)  # (nkeys, kk)
                last = None
                for j in range(kk):
                    last = {k: float(vals[i, j])
                            for i, k in enumerate(keys)}
                    emit(b0 + j, (b0 + j + 1) * cfg.batch_size, last)
                return last

            def preempt_save(next_batch_idx):
                if ckpt_dir:
                    save_checkpoint(
                        checkpoint_name(ckpt_dir, epoch - 1,
                                        "preempt"),
                        state, {"epoch": epoch - 1, "net": cfg.net,
                                "preempted_in_epoch": epoch,
                                "resume_batch_idx": next_batch_idx})
                    print(f"SIGTERM: saved preemption checkpoint "
                          f"{epoch - 1}-preempt (next batch "
                          f"{next_batch_idx}); resume with -resume")

            skip = resume_skip if epoch == resume_epoch else 0
            if use_chain:
                # k steps per host round-trip: gather+step chained in one
                # lax.scan program over the HBM-resident dataset
                idx_all = train_loader.epoch_indices(epoch - 1)[skip:]
                pos = 0
                while pos < len(idx_all):
                    if stop["flag"]:
                        preempt_save(skip + pos)
                        return state, history
                    kk = min(cfg.dispatch_chain, len(idx_all) - pos)
                    if cfg.stop_after_batches is not None:
                        # never overshoot a deterministic stop point
                        kk = min(kk, max(
                            cfg.stop_after_batches - applied, 1))
                    idx_k = (np.ascontiguousarray(idx_all[pos: pos + kk])
                             if nproc > 1
                             else jnp.asarray(idx_all[pos: pos + kk]))
                    state, ms = chain_step(state, train_loader.images,
                                           train_loader.labels, idx_k)
                    applied += kk
                    if cfg.stop_after_batches is not None \
                            and applied >= cfg.stop_after_batches:
                        stop["flag"] = True
                    if pending is not None:
                        report(pending)
                    pending = (skip + pos, ms, kk)
                    pos += kk
            else:
                for batch_idx, batch in enumerate(
                        train_loader.epoch(epoch - 1)):
                    if batch_idx < skip:
                        continue  # replaying a preempted epoch
                    if stop["flag"]:
                        preempt_save(batch_idx)
                        return state, history
                    state, metrics = train_step(state, batch)
                    applied += 1
                    if cfg.stop_after_batches is not None \
                            and applied >= cfg.stop_after_batches:
                        stop["flag"] = True
                    if pending is not None and \
                            (sync_every == 1
                             or pending[0] % sync_every == 0):
                        # step batch_idx is already dispatched; syncing
                        # batch_idx-1 here overlaps with it rather than
                        # stalling the device
                        report(pending)
                    pending = (batch_idx, metrics, 1)
            if pending is not None:
                metrics = report(pending)
            if logger is not None:
                logger.scalar("Train/LearningRate", metrics["lr"], epoch)
                logger.scalar("Train/Beta1", metrics["beta1"], epoch)
                logger.param_histograms(state.params, epoch)
            if not quiet:
                print(f"time for training epoch {epoch} : "
                      f"{time.time() - start:.2f}s")

            test_start = time.time()
            loss_sum, cm, n_batches = evaluate(state, eval_step, val_loader,
                                               normalize, cfg.batch_size,
                                               sharding=bsh)
            if not quiet:
                print(f"Evaluation time comsumed:"
                      f"{time.time() - test_start:.2f}s")
            miou, all_acc = print_epoch_metrics(
                cm, train_ds.class_names, train_ds.ignore_index, quiet)
            if logger is not None:
                logger.scalar("Test/mIOU", miou, epoch)
                logger.scalar("Test/Acc", all_acc, epoch)
                # per-batch normalization like the reference (eval.py:68)
                logger.scalar("Test/Loss", loss_sum / max(n_batches, 1),
                              epoch)
            history.append({"epoch": epoch, "miou": miou,
                            "all_acc": all_acc})

            if ckpt_dir:
                meta = {"epoch": epoch, "miou": miou, "net": cfg.net}
                if best_iou < miou and epoch > cfg.epochs // 2:
                    best_iou = miou
                    save_checkpoint(
                        checkpoint_name(ckpt_dir, epoch, "best"),
                        state, meta)
                    continue  # same cadence quirk as train.py:232-240
                if not epoch % cfg.save_epoch:
                    save_checkpoint(
                        checkpoint_name(ckpt_dir, epoch,
                                        "regular"), state, meta)
    finally:
        # restore on EVERY exit (including exceptions like the nan_guard
        # FloatingPointError) so a stale stop-dict closure never swallows
        # later SIGTERMs
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
    return state, history
