"""Unified training CLI for all four workloads.

Replaces the reference's four separate drivers
(`Static/transductive/train.py`, `Static/inductive/train.py`,
`Temporal/interpolation/main*.py`, `Temporal/extrapolation/main.py`):

    python -m redgnn_tpu.cli.train --task transductive \
        --data_path /root/reference/Static/transductive/data/umls
    python -m redgnn_tpu.cli.train --task inductive \
        --data_path /root/reference/Static/inductive/data/fb237_v1
    python -m redgnn_tpu.cli.train --task interpolation --data_path <dir>
    python -m redgnn_tpu.cli.train --task extrapolation \
        --data_path /root/reference/Temporal/extrapolation/data/ICEWS14_forecasting

Per-dataset tuned hyperparameters load from the config registry
(`redgnn_tpu.utils.config`); any field can be overridden with
``--set field=value``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def parse_overrides(pairs, cfg):
    for pair in pairs or []:
        key, _, raw = pair.partition("=")
        if not hasattr(cfg, key):
            raise SystemExit(f"unknown config field: {key}")
        cur = getattr(cfg, key)
        if isinstance(cur, bool):
            val = raw.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(raw)
        elif isinstance(cur, float):
            val = float(raw)
        elif cur is None:
            # Optional fields: infer numeric types from the literal
            if raw.lower() in ("none", "null"):
                val = None
            else:
                try:
                    val = int(raw)
                except ValueError:
                    try:
                        val = float(raw)
                    except ValueError:
                        val = raw
        else:
            val = raw
        cfg = dataclasses.replace(cfg, **{key: val})
    return cfg


def main(argv=None):
    p = argparse.ArgumentParser(description="redgnn_tpu trainer")
    p.add_argument("--task", required=True,
                   choices=["transductive", "inductive", "interpolation",
                            "extrapolation"])
    p.add_argument("--model", default="redgnn",
                   choices=["redgnn", "xerte", "simple"],
                   help="extrapolation baselines: xERTE "
                        "(`Temporal/extrapolation/train.py`) / SimplE "
                        "(`main_nontemporal.py`)")
    p.add_argument("--data_path", required=True)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--results_dir", default="results")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--load_checkpoint", default=None)
    p.add_argument("--resume_latest", action="store_true",
                   help="resume from <ckpt_dir>/latest.msgpack if present "
                        "(elastic recovery after a TPU worker crash)")
    p.add_argument("--eval_only", action="store_true")
    p.add_argument("--eval_splits", default=None,
                   help="comma-separated extra eval splits evaluated on "
                        "the best checkpoint after training (seen/unseen "
                        "entity protocol of `extrapolation/main.py:121`, "
                        "e.g. valid_seen,valid_unseen,test_seen,"
                        "test_unseen)")
    p.add_argument("--sqlite", default=None,
                   help="path to a sqlite experiment db")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--set", nargs="*", metavar="FIELD=VALUE",
                   help="override any config field")
    p.add_argument("--timer", action="store_true",
                   help="per-epoch phase wall-clock buckets (the "
                        "reference's --timer time_cost accounting, "
                        "`extrapolation/main.py:39-52`)")
    p.add_argument("--hpo", type=int, default=None, metavar="N",
                   help="run an N-trial ASHA hyperparameter search over "
                        "the task's reference space instead of a single "
                        "fit (`ray_hpo.py:280-287`, "
                        "`hyperopt_train.py:167-175`)")
    p.add_argument("--hpo_workers", type=int, default=1,
                   help="concurrent trials per ASHA rung (one local "
                        "device each; trial-parallel HPO)")
    p.add_argument("--attention_stats", default=None, metavar="PATH.npz",
                   help="after training, dump (query-rel x edge-rel) "
                        "attention sum/count statistics "
                        "(`model_cuda_new_embdding.py:117-125`)")
    p.add_argument("--mesh", default=None, metavar="D[xE]",
                   help="shard the run over a device mesh: D data-parallel"
                        " shards (query-parallel), optionally x E "
                        "edge-parallel slices per shard (static models "
                        "only). Example: --mesh 4x2 on 8 chips.")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed for multi-host runs: "
                        "explicit coordinator env (JAX_COORDINATOR_ADDRESS,"
                        " JAX_NUM_PROCESSES, JAX_PROCESS_ID) when set, "
                        "else pod-metadata auto-detect; warns and runs "
                        "single-process when neither is available")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a jax backend (the axon tunnel plugin "
                        "overrides JAX_PLATFORMS, so --platform cpu is the "
                        "only reliable way to train on host CPU while the "
                        "single TPU chip is busy with another run)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # Persistent compilation cache: the tunneled TPU worker dies often
    # enough that elastic restarts are routine; re-tracing is unavoidable
    # but XLA compilation (~30s/program over the tunnel) is not.
    cache_dir = os.environ.get("REDGNN_COMPILE_CACHE",
                               "/tmp/redgnn_jax_cache")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # older jax without the knobs

    from redgnn_tpu.utils.config import dataset_config
    from redgnn_tpu.utils.reporting import ExperimentLogger
    from redgnn_tpu.utils.memory import PeakRSSMonitor, write_memory_report

    if args.distributed:
        from redgnn_tpu.parallel.runtime import initialize_distributed

        info = initialize_distributed()
        print(f"distributed runtime: process {info['process_index']}/"
              f"{info['process_count']}, {info['local_devices']} local / "
              f"{info['global_devices']} global devices")

    mesh = None
    if args.mesh:
        from redgnn_tpu.parallel.mesh import make_mesh

        parts = args.mesh.lower().split("x")
        n_data = int(parts[0])
        n_edge = int(parts[1]) if len(parts) > 1 else 1
        if args.model != "redgnn":
            raise SystemExit("--mesh supports the redgnn model only")
        if args.task not in ("transductive", "inductive") and n_edge > 1:
            raise SystemExit("temporal tasks shard the data axis only; "
                             "use --mesh D")
        mesh = make_mesh(n_data, n_edge)
        print(f"mesh: {n_data} data x {n_edge} edge over "
              f"{n_data * n_edge} devices")

    dataset = os.path.basename(args.data_path.rstrip("/"))

    if args.task in ("transductive", "inductive"):
        from redgnn_tpu.train.loop import StaticTrainer

        task_key = ("static_transductive" if args.task == "transductive"
                    else "static_inductive")
        cfg = dataset_config(task_key, dataset)
        if args.seed is not None:
            cfg = dataclasses.replace(cfg, seed=args.seed)
        cfg = parse_overrides(args.set, cfg)
        if args.task == "transductive":
            from redgnn_tpu.graph.kg import StaticKG

            kg = StaticKG.load(args.data_path)
        else:
            from redgnn_tpu.graph.inductive import InductiveKG

            kg = InductiveKG.load(args.data_path)
        build_trainer = lambda c: StaticTrainer(kg, c, mesh=mesh)
        trainer = None if args.hpo else build_trainer(cfg)
    else:
        from redgnn_tpu.graph.temporal import TemporalKG
        from redgnn_tpu.train.temporal_loop import TemporalTrainer

        # extrapolation dirs named after the plain dataset (e.g.
        # `Temporal/extrapolation/data/YAGO`) resolve to the
        # `<name>_forecasting` registry entry — otherwise the lookup
        # silently falls back to interpolation defaults (granularity 24).
        from redgnn_tpu.utils.config import DATASET_CONFIGS

        cfg_key = dataset
        if (args.task == "extrapolation"
                and cfg_key not in DATASET_CONFIGS["temporal"]
                and f"{cfg_key}_forecasting" in DATASET_CONFIGS["temporal"]):
            cfg_key = f"{cfg_key}_forecasting"
        cfg = dataset_config("temporal", cfg_key)
        if args.task == "extrapolation" and cfg.mode != "extrapolation":
            cfg = dataclasses.replace(cfg, mode="extrapolation", window=120)
        if args.seed is not None:
            cfg = dataclasses.replace(cfg, seed=args.seed)
        set_pairs = list(args.set or [])
        if args.model == "xerte":
            # --set keys split between the trainer config and XErteConfig
            xerte_pairs = [p for p in set_pairs
                           if not hasattr(cfg, p.partition("=")[0])]
            set_pairs = [p for p in set_pairs
                         if hasattr(cfg, p.partition("=")[0])]
        explicit_keys = {p.partition("=")[0] for p in set_pairs}
        cfg = parse_overrides(set_pairs, cfg)
        id_based = os.path.exists(
            os.path.join(args.data_path, "entity2id.txt"))
        if id_based:
            kg = TemporalKG.load_id_dir(
                args.data_path, add_inverse=True,
                time_granularity=cfg.time_granularity,
                graph_from_all_splits=(cfg.mode == "extrapolation"),
                warm_start_time=48 if cfg.mode == "extrapolation" else 0,
            )
        else:
            kg = TemporalKG.load_vocab_dir(args.data_path)
        if args.model == "xerte":
            from redgnn_tpu.models.xerte import XErteConfig
            from redgnn_tpu.train.xerte_loop import XErteTrainer

            xcfg = XErteConfig(n_ent=kg.n_ent, n_rel=kg.idd_rel,
                               n_time=kg.n_time + 2)
            xcfg = parse_overrides(xerte_pairs, xcfg)
            # trainer knobs default to the reference xERTE values
            # (lr 1e-3, batch 128) unless explicitly --set (detected from
            # the --set key list itself, not by value comparison)
            kwargs = {}
            for field in ("lr", "batch_size", "grad_clip"):
                if field in explicit_keys:
                    kwargs[field] = getattr(cfg, field)
            trainer = XErteTrainer(kg, xcfg, seed=cfg.seed,
                                   grad_accum_steps=cfg.grad_accum_steps,
                                   epochs=cfg.epochs,
                                   max_train_batches=cfg.max_train_batches,
                                   max_eval_batches=cfg.max_eval_batches,
                                   **kwargs)
        elif args.model == "simple":
            from redgnn_tpu.train.simple_loop import SimplETrainer

            trainer = SimplETrainer(kg, seed=cfg.seed, epochs=cfg.epochs)
        else:
            build_trainer = lambda c: TemporalTrainer(kg, c, mesh=mesh)
            trainer = None if args.hpo else build_trainer(cfg)

    logger = ExperimentLogger(args.results_dir, dataset, cfg,
                              sqlite_path=args.sqlite)
    print(json.dumps(dataclasses.asdict(cfg)))

    if args.timer:
        if trainer is None or not hasattr(trainer, "timer"):
            raise SystemExit("--timer supports the redgnn trainers only "
                             "(and not --hpo)")
        trainer.timer.enabled = True

    if args.hpo:
        if args.model != "redgnn":
            raise SystemExit("--hpo supports the redgnn model only")
        from redgnn_tpu.utils.hpo import (
            INTERPOLATION_SPACE, STATIC_SPACE, asha_search)

        space = (STATIC_SPACE if args.task in ("transductive", "inductive")
                 else INTERPOLATION_SPACE)

        if args.hpo_workers > 1 and args.task in ("transductive",
                                                   "inductive"):
            # static trials resplit the SHARED kg per epoch — racy across
            # threads; trial-parallelism is temporal-only for now
            raise SystemExit("--hpo_workers > 1 supports temporal tasks "
                             "only (static trials re-split a shared graph)")

        def run_trial(params_d, epochs, state):
            if state is None:
                tcfg = dataclasses.replace(cfg, **params_d)
                tr, done = build_trainer(tcfg), 0
            else:
                tr, done = state
            metric = -1.0
            for e in range(done, done + epochs):
                tr.train_epoch(e)
                metric = tr.evaluate("valid")["mrr"]
                if hasattr(tr.kg, "resplit"):
                    # per-epoch 3:1 facts/train re-split, same regime as
                    # the real fit() (`load_data.py:152-164`)
                    tr.kg.resplit(tr._np_rng)
            return float(metric), (tr, done + epochs)

        best = asha_search(
            space, run_trial, num_trials=args.hpo,
            max_epochs=args.epochs or 8,
            seed=cfg.seed, n_workers=args.hpo_workers,
            log_path=os.path.join(args.results_dir,
                                  f"{dataset}_hpo.jsonl"))
        line = "HPO_BEST " + json.dumps(
            {"params": best.params, "valid_mrr": best.metric,
             "epochs": best.epochs_done}, default=float)
        logger.write_perf(line)
        print(line)
        logger.close()
        return

    def apply_lr_override():
        # a restore brings back the checkpoint's lr (optimizer hyperparams
        # + host sidecar); an EXPLICIT --set lr=... must win over both
        if "lr" in (set(p.partition("=")[0] for p in args.set or [])) \
                and hasattr(trainer, "force_lr"):
            trainer.force_lr(cfg.lr)
            print(f"lr override after restore: {cfg.lr}")

    start_epoch = 0
    if args.load_checkpoint:
        epoch = trainer.restore(args.load_checkpoint)
        print(f"restored checkpoint from epoch {epoch}")
        apply_lr_override()
    elif args.resume_latest and args.ckpt_dir:
        from redgnn_tpu.utils.checkpoint import load_latest

        try:
            latest = load_latest(args.ckpt_dir, trainer.state())
        except Exception as e:  # e.g. optimizer-structure change
            print(f"latest checkpoint incompatible ({e}); starting fresh")
            latest = None
        if latest is not None:
            state, start_epoch, _ = latest
            trainer.params = state["params"]
            trainer.opt_state = state["opt_state"]
            if hasattr(trainer, "restore_host"):
                # plateau counters / live lr / rng from the JSON sidecar
                trainer.restore_host(
                    os.path.join(args.ckpt_dir, "latest.msgpack"))
            print(f"resuming from latest checkpoint at epoch {start_epoch}")
            apply_lr_override()

    def dump_attention_stats():
        if not args.attention_stats:
            return
        if not hasattr(trainer, "collect_attention"):
            print("--attention_stats supports temporal redgnn only")
            return
        import numpy as np

        acc = trainer.collect_attention("valid")
        np.savez(args.attention_stats, stats=acc)
        print(f"attention stats (sum/count by query-rel x edge-rel) -> "
              f"{args.attention_stats}")

    def eval_extra_splits():
        if not args.eval_splits:
            return
        out = {}
        for split in args.eval_splits.split(","):
            split = split.strip()
            known = getattr(trainer.kg, "splits", None)
            if known is None or split not in known:
                print(f"eval split '{split}' not available; skipping")
                continue
            out[split] = trainer.evaluate(split)
        line = "EVAL_SPLITS " + json.dumps(out, default=float)
        logger.write_perf(line)
        print(line)

    if args.eval_only:
        vm = trainer.evaluate("valid")
        tm = trainer.evaluate("test")
        print(json.dumps({"valid": vm, "test": tm}, default=float))
        eval_extra_splits()
        dump_attention_stats()
        return

    from redgnn_tpu.utils.linetrace import maybe_trace_from_env

    with PeakRSSMonitor() as mon, maybe_trace_from_env():
        best = trainer.fit(epochs=args.epochs, logger=logger,
                           ckpt_dir=args.ckpt_dir, start_epoch=start_epoch)
    print(write_memory_report(logger.mem_path, "run", mon.peak_rss_bytes))
    logger.write_perf("BEST " + json.dumps(best))
    print("BEST", json.dumps(best, default=float))
    if args.eval_splits:
        # seen/unseen protocol runs on the best-valid checkpoint
        if args.ckpt_dir:
            from redgnn_tpu.utils.checkpoint import best_checkpoint

            bp = best_checkpoint(args.ckpt_dir)
            if bp:
                trainer.restore(bp)
                print(f"eval_splits: restored best checkpoint {bp}")
        eval_extra_splits()
    dump_attention_stats()
    logger.close()


if __name__ == "__main__":
    main()
