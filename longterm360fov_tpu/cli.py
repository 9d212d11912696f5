"""Command-line entry points (SURVEY.md §2.1 `cli`).

One CLI replaces the reference's per-experiment scripts/notebooks:

  python -m longterm360fov_tpu prepare-data --out data.npz [--traces DIR]
  python -m longterm360fov_tpu train --preset seq2seq-tf-30 [--data data.npz]
  python -m longterm360fov_tpu eval --preset ... --ckpt DIR [--data ...]
  python -m longterm360fov_tpu serve-bench --preset ...
  python -m longterm360fov_tpu presets
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="longterm360fov_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pd = sub.add_parser("prepare-data", help="traces → packed windows npz")
    pd.add_argument("--out", required=True)
    pd.add_argument("--traces", help="directory of trace logs (per-video subdirs); synthetic store if omitted")
    pd.add_argument(
        "--dataset-format", default="auto",
        help="trace layout: auto|tsinghua|quat_wxyz|quat_xyzw|euler_deg|euler_rad",
    )
    pd.add_argument("--h-in", type=int, default=30)
    pd.add_argument("--h-out", type=int, default=30)
    pd.add_argument("--rate-hz", type=float, default=10.0)
    pd.add_argument("--stride", type=int, default=1)
    pd.add_argument("--n-other-users", type=int, default=0)
    pd.add_argument("--n-users", type=int, default=8, help="synthetic only")
    pd.add_argument("--n-videos", type=int, default=2, help="synthetic only")
    pd.add_argument("--n-frames", type=int, default=1200, help="synthetic only")
    pd.add_argument(
        "--features",
        help="per-video feature npz from extract-features; windows gain "
        "a 'features' vector for the fusion family",
    )

    xf = sub.add_parser(
        "extract-features",
        help="equirect video frames → per-frame feature vectors "
        "(SURVEY.md §3.4: decode → saliency/motion → conv stack)",
    )
    xf.add_argument(
        "--frames-dir", required=True,
        help="directory of per-video frame sources (<video>.npy/.npz "
        "arrays of (T,H,W,3) frames, or video files when OpenCV can "
        "decode them)",
    )
    xf.add_argument("--out", required=True, help="output npz (one array per video)")
    xf.add_argument("--max-frames", type=int)
    xf.add_argument("--stride", type=int, default=1)
    xf.add_argument("--seed", type=int, default=0, help="conv filter seed")

    tr = sub.add_parser("train", help="train a preset")
    tr.add_argument("--preset", required=True)
    tr.add_argument("--data", help="packed npz from prepare-data; synthetic if omitted")
    tr.add_argument("--steps", type=int)
    tr.add_argument("--batch-size", type=int)
    tr.add_argument("--lr", type=float)
    tr.add_argument(
        "--accum", type=int,
        help="gradient-accumulation microbatches per optimizer step "
        "(logical batch > HBM activation budget)",
    )
    tr.add_argument(
        "--gc-weight", type=float, dest="gc_weight",
        help="blend weight of the spherical great-circle loss "
        "(0 = reference's pure MSE; ~0.2-0.5 measured best, RESULTS.md)",
    )
    tr.add_argument(
        "--peer-align", action="store_true", dest="peer_align",
        help="cross_user family: time-aligned peer context — decoder "
        "step t conditions on the peer encoder's state AT step t "
        "instead of one pooled final-state vector (XLA train path; "
        "the LSTM analog of the transformer's windowed peers)",
    )
    tr.add_argument(
        "--train-compute", dest="train_compute",
        choices=["float32", "bfloat16"],
        help="matmul dtype inside the fused training kernels (bfloat16 "
        "= single-pass MXU with f32 accumulation)",
    )
    tr.add_argument("--ckpt-dir")
    tr.add_argument("--log-file")
    tr.add_argument("--tb-dir", help="TensorBoard scalar log dir (optional)")
    tr.add_argument("--resume", action="store_true")
    tr.add_argument("--data-parallel", action="store_true")
    tr.add_argument(
        "--seq-parallel", type=int, default=0, metavar="N",
        help="shard the transformer training horizon over N devices via "
        "ring attention (parallel.sp); remaining devices auto-fill a "
        "'data' mesh axis. Transformer family only — LSTM recurrence "
        "is O(1) state and needs no SP",
    )
    tr.add_argument(
        "--pipeline-parallel", type=int, default=0, metavar="S",
        help="pipeline the transformer decoder stack over S stage "
        "devices (GPipe-style microbatching, parallel.pp). Transformer "
        "family only; S must divide the layer count",
    )
    tr.add_argument("--bf16", action="store_true", help="bfloat16 params/compute")

    ev = sub.add_parser("eval", help="evaluate a checkpoint")
    ev.add_argument("--preset", required=True)
    ev.add_argument("--ckpt-dir", required=True)
    ev.add_argument("--data")
    ev.add_argument("--json", action="store_true")
    ev.add_argument("--plot", help="write <PLOT>_curve.png and <PLOT>_traj.png")

    sb = sub.add_parser("serve-bench", help="decode-throughput microbench")
    sb.add_argument("--preset", default="seq2seq-tf-30")
    sb.add_argument("--batch", type=int, default=4096)
    sb.add_argument("--iters", type=int, default=30)
    sb.add_argument(
        "--impl", default="xla", choices=("xla", "fused"),
        help="fused = whole-request Pallas serve kernel (LSTM families)",
    )

    pr = sub.add_parser(
        "predict",
        help="one-shot offline prediction: each viewer trace's last H_in "
        "frames in, predicted (yaw, pitch) trajectory out — one JSON "
        "line per viewer (SURVEY.md §3.3's batch path; the daemon is "
        "the online counterpart)",
    )
    pr.add_argument("--preset", required=True)
    group = pr.add_mutually_exclusive_group(required=True)
    group.add_argument("--ckpt-dir", help="orbax checkpoint directory")
    group.add_argument(
        "--params", help="flat npz from `export` (numpy-only host)"
    )
    pr.add_argument(
        "--traces", help="trace dir; synthetic store if omitted"
    )
    pr.add_argument("--dataset-format", default="auto")
    pr.add_argument(
        "--at-frame", type=int, default=None, metavar="N",
        help="predict from the window ENDING at frame N (exclusive); "
        "default: each trace's last frame",
    )
    pr.add_argument(
        "--peers", type=int, default=-1,
        help="cross-viewer context size K (other viewers of the same "
        "video whose frames past the window end are known — the "
        "on-demand scenario); -1 = the preset's K for peer-consuming "
        "families, 0 = none",
    )
    pr.add_argument(
        "--tiles", action="store_true",
        help="include the unioned prefetch tile set per viewer",
    )
    pr.add_argument("--tile-rows", type=int, default=6)
    pr.add_argument("--tile-cols", type=int, default=12)
    pr.add_argument("--fov", type=float, default=90.0)
    pr.add_argument("--out", help="output JSONL path (default: stdout)")
    pr.add_argument("--impl", default="xla", choices=("xla", "fused"))
    pr.add_argument(
        "--peer-group", action="store_true",
        help="GROUP-shared peer serving (peer-consuming families): one "
        "peer set per video — the first K full-span traces, shared by "
        "every viewer of that video (a viewer may appear in its own "
        "peer set offline; live daemons can't, their own future is "
        "unobserved). Transformers share projected peer K/V in the "
        "kernel; cross_user gathers per row on-device — either way one "
        "peer copy per video crosses host→device "
        "(serving.make_grouped_serve_fn, the peer-dedup tier)",
    )

    sv = sub.add_parser(
        "serve", help="streaming-prefetch simulation: hit rate + bandwidth"
    )
    sv.add_argument("--preset", required=True)
    sv.add_argument("--ckpt-dir", required=True)
    sv.add_argument("--data")
    sv.add_argument("--fov", type=float, default=90.0)
    sv.add_argument("--tile-rows", type=int, default=6)
    sv.add_argument("--tile-cols", type=int, default=12)

    st = sub.add_parser(
        "stream-sim",
        help="continuous streaming simulation: per-deadline prefetch hit rates",
    )
    st.add_argument("--preset", required=True)
    st.add_argument("--ckpt-dir", required=True)
    st.add_argument("--traces", help="trace dir; synthetic store if omitted")
    st.add_argument("--dataset-format", default="auto")
    st.add_argument("--deadlines", default="1,10,30")
    st.add_argument(
        "--peers", type=int, default=-1,
        help="cross-viewer context size K in the simulation (peers = "
        "other simulated viewers' known futures, the on-demand "
        "scenario); -1 = the preset's K for peer-consuming families",
    )
    st.add_argument("--fov", type=float, default=90.0)
    st.add_argument("--impl", default="xla", choices=("xla", "fused"))

    sd = sub.add_parser(
        "serve-daemon",
        help="online prediction server: line-JSON TCP, dynamic batching "
        "over concurrent viewers, per-viewer pose sessions, prefetch "
        "tile sets (the production counterpart of serve-bench)",
    )
    sd.add_argument("--preset", required=True)
    group = sd.add_mutually_exclusive_group(required=True)
    group.add_argument("--ckpt-dir", help="orbax checkpoint directory")
    group.add_argument(
        "--params", help="flat npz from `export` (numpy-only serving host)"
    )
    sd.add_argument("--host", default="127.0.0.1")
    sd.add_argument("--port", type=int, default=8360)
    sd.add_argument(
        "--max-batch", type=int, default=256,
        help="largest coalesced batch (bucket ladder caps here; "
        "compiles once per power-of-two bucket)",
    )
    sd.add_argument(
        "--max-wait-ms", type=float, default=2.0,
        help="how long a lone request waits for co-arrivals",
    )
    sd.add_argument(
        "--pipeline-depth", type=int, default=4,
        help="batches allowed in flight awaiting device readback; "
        "overlaps host batching with device compute (1 = minimal)",
    )
    sd.add_argument(
        "--grouped-warmup", default=None,
        help="pre-compile the GROUPED bulk path for these shapes before "
        "the socket opens: 'ROWSxGROUPS[,ROWSxGROUPS...]', e.g. "
        "'2048x8,256x4' — the grouped gateway has its own row/group "
        "bucket ladders, so the per-row warmup does not cover it and "
        "the first live grouped request would pay the compile",
    )
    sd.add_argument("--no-tiles", action="store_true",
                    help="skip prefetch tile sets in responses")
    sd.add_argument("--tile-rows", type=int, default=6)
    sd.add_argument("--tile-cols", type=int, default=12)
    sd.add_argument("--fov", type=float, default=90.0)
    sd.add_argument(
        "--impl", default="auto", choices=("auto", "xla", "fused"),
        help="auto = fused Pallas tier on real TPU, XLA scan elsewhere",
    )
    sd.add_argument(
        "--data-parallel", action="store_true",
        help="shard every dispatch over all local chips ('data' mesh "
        "axis); batch buckets start at the chip count",
    )

    ex = sub.add_parser(
        "export", help="checkpoint → flat npz for serving deployments"
    )
    ex.add_argument("--preset", required=True)
    ex.add_argument("--ckpt-dir", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--step", type=int, help="default: latest")

    it = sub.add_parser(
        "inspect-traces",
        help="sniff a trace directory: per-file layout guess, rate, "
        "ranges, quaternion-norm sanity (de-risks the unverified "
        "public-dataset adapters before prepare-data)",
    )
    it.add_argument("--traces", required=True)
    it.add_argument("--limit", type=int, default=20, help="max files shown")
    it.add_argument(
        "--validate",
        action="store_true",
        help="strict mode: every file must parse unambiguously and pass "
        "all sanity checks; exit code 2 on any failure (run this before "
        "trusting prepare-data on a new dataset)",
    )
    it.add_argument(
        "--dataset-format",
        default="auto",
        # kept in sync with datasets.FORMATS by tests/test_datasets.py
        choices=[
            "auto", "euler_deg", "euler_rad", "quat_wxyz", "quat_xyzw",
            "tsinghua",
        ],
        help="pin the layout instead of sniffing (validate mode reports "
        "ambiguity errors that this resolves)",
    )
    it.add_argument("--rate", type=float, default=10.0, help="resample Hz")

    # --peer-align / --h-in / --h-out change what the params MEAN (all
    # three are part of the model hash), so every subcommand that loads
    # a checkpoint must be able to declare them — not just train (found
    # by /verify: eval of an align-trained checkpoint had no way to
    # match the model hash). On train they select the architecture
    # (e.g. the 100-frame quality recipe: train --preset
    # stacked-ss-crossuser --h-in 100 --h-out 100 --peer-align).
    for cp in (tr, ev, sb, pr, sv, st, sd, ex):
        cp.add_argument(
            "--h-in", type=int, dest="model_h_in", metavar="T",
            help="override the preset's input-window length (model "
            "horizon, not the prepare-data window flag); part of the "
            "model hash — must match between train and eval/serve",
        )
        cp.add_argument(
            "--h-out", type=int, dest="model_h_out", metavar="T",
            help="override the preset's prediction horizon; part of "
            "the model hash — must match between train and eval/serve",
        )
        if cp not in (pr, st):  # predict/stream-sim define --peers
            cp.add_argument(
                "--peers", type=int, default=-1,
                help="cross-viewer context size K for this run (e.g. "
                "7 for the RESULTS.md 100-frame recipe; params are "
                "K-agnostic); -1 = the preset's K",
            )
        if cp is tr:
            continue  # train already registers --peer-align above
        cp.add_argument(
            "--peer-align", action="store_true", dest="peer_align",
            help="cross_user family: the checkpoint was trained with "
            "time-aligned peer context (--peer-align); this flag must "
            "match training or the model-hash check refuses the load",
        )

    sub.add_parser("presets", help="list experiment presets")
    return p


def _preset_cfg(args, **over):
    """Preset + the model-shape overrides shared by every subcommand
    that must reconstruct the trained architecture (--peer-align,
    --h-in, --h-out — all part of the model hash)."""
    from .config import get_preset

    if getattr(args, "peer_align", False):
        over["model_peer_align"] = True
    for k in ("model_h_in", "model_h_out"):
        v = getattr(args, k, None)
        if v is not None:
            over[k] = v
    # --peers overrides the config's peer-context size K (a data/
    # serving-schema knob — NOT part of the model hash, the params are
    # K-agnostic). predict/stream-sim keep their own inference-time
    # --peers semantics (how many peers to assemble per request, which
    # may legitimately differ from the trained K).
    if getattr(args, "cmd", None) not in ("predict", "stream-sim") and (
        getattr(args, "peers", -1) >= 0
    ):
        over["n_other_users"] = args.peers
    return get_preset(args.preset, **over)


def _open_checkpoint(ckpt_dir, cfg, *, resuming=False):
    """Construct a Checkpointer and validate its on-disk config hashes.

    A model-hash mismatch means the stored params would be silently
    misinterpreted (different architecture/family semantics) → hard
    error. A full-hash mismatch only differs in training hyperparameters
    — expected when a run trained with CLI overrides is evaluated under
    the bare preset — so it only warns when resuming training."""
    from . import checkpoint as C

    ck = C.Checkpointer(ckpt_dir, cfg)
    if not ck.check_model_config():
        raise SystemExit(
            f"checkpoint in {ckpt_dir!r} was written for a different model "
            f"architecture/family than preset {cfg.name!r} (model-config "
            f"hash mismatch); evaluating it here would silently "
            f"misinterpret the parameters. Use the preset it was trained "
            f"with."
        )
    if resuming and not ck.check_config():
        print(
            f"warning: resuming in {ckpt_dir!r} with different training "
            f"hyperparameters than the checkpoint was created with "
            f"(config hash mismatch; architecture matches)",
            file=sys.stderr,
        )
    return ck


def _load_or_synth_data(args, cfg):
    from . import data as D
    from . import traces as T

    if getattr(args, "data", None):
        packed = D.load_packed(args.data)
        # prepare-data writes a time-split held-out file next to the train
        # file; use it so eval windows never share frames with training
        # windows (sliding windows straddling an index cut would leak).
        test_path = os.path.splitext(args.data)[0] + "_test.npz"
        if os.path.exists(test_path):
            return packed, D.load_packed(test_path)
        print(
            f"warning: {test_path} not found; falling back to a 90/10 "
            f"window-index split (boundary windows share frames across "
            f"the cut — prefer prepare-data's paired _test.npz)",
            file=sys.stderr,
        )
        n = len(packed["past"])
        cut = int(n * 0.9)
        train_d = {k: v[:cut] for k, v in packed.items()}
        test_d = {k: v[cut:] for k, v in packed.items()}
        return train_d, test_d
    store = T.synthetic_store(
        n_users=8, n_videos=2, n_frames=1200, rate_hz=cfg.rate_hz,
        seed=cfg.seed,
    )
    return D.windows_from_store(
        store, cfg.model.h_in, cfg.model.h_out,
        stride=cfg.stride, n_other_users=cfg.n_other_users
        if cfg.model_family in ("cross_user", "transformer") else 0,
    )


def cmd_prepare_data(args):
    from . import data as D
    from . import traces as T

    if args.traces:
        from . import datasets as DSETS

        store = DSETS.load_dataset(
            args.traces, fmt=args.dataset_format, rate_hz=args.rate_hz
        )
        if not len(store):
            raise SystemExit(
                f"no parseable traces under {args.traces} "
                f"(format={args.dataset_format})"
            )
    else:
        store = T.synthetic_store(
            n_users=args.n_users, n_videos=args.n_videos,
            n_frames=args.n_frames, rate_hz=args.rate_hz,
        )
    video_features = None
    if args.features:
        with np.load(args.features) as z:
            video_features = {k: z[k] for k in z.files}
        print(f"loaded features for {len(video_features)} videos")
    train_d, test_d = D.windows_from_store(
        store, args.h_in, args.h_out, stride=args.stride,
        n_other_users=args.n_other_users,
        video_features=video_features,
    )
    span = args.h_in + args.h_out
    for split, d in (("train", train_d), ("test", test_d)):
        if not d:
            # e.g. 600-frame traces at h_in=h_out=100: the 20% test
            # tail is 120 frames < the 200-frame window span
            raise SystemExit(
                f"zero {split} windows: every trace's {split} segment "
                f"is shorter than h_in+h_out = {span} frames (traces "
                f"are split 80/20 per trace). Use longer traces or a "
                f"shorter horizon."
            )
    D.save_packed(args.out, train_d)
    test_path = os.path.splitext(args.out)[0] + "_test.npz"
    D.save_packed(test_path, test_d)
    print(
        f"wrote {len(train_d['past'])} train / {len(test_d['past'])} test "
        f"windows from {len(store)} traces → {args.out}, {test_path}"
    )


def cmd_train(args):
    from . import train as TR
    from .models import get_family

    over = {}
    for k in ("steps", "batch_size", "lr", "accum", "gc_weight",
              "train_compute"):
        v = getattr(args, k)
        if v is not None:
            over[k] = v
    if args.data_parallel:
        over["data_parallel"] = True
    if args.bf16:
        over["model_param_dtype"] = "bfloat16"
    cfg = _preset_cfg(args, **over)  # + --peer-align/--h-in/--h-out
    fam = get_family(cfg.model_family)
    sp_mesh = None
    if args.seq_parallel:
        if args.seq_parallel < 1:
            raise SystemExit(
                f"--seq-parallel must be >= 1 (got {args.seq_parallel})"
            )
        if cfg.model_family != "transformer":
            raise SystemExit(
                "--seq-parallel applies to the transformer family only "
                "(LSTM recurrence carries O(1) state over any horizon)"
            )
        if cfg.data_parallel:
            raise SystemExit(
                "--seq-parallel already composes with data parallelism "
                "(spare devices auto-fill the 'data' mesh axis); drop "
                "--data-parallel"
            )
        if cfg.model.h_out % args.seq_parallel:
            raise SystemExit(
                f"horizon {cfg.model.h_out} not divisible by "
                f"--seq-parallel {args.seq_parallel}"
            )
        from .parallel.sp import make_sp_mesh

        try:
            sp_mesh = make_sp_mesh(args.seq_parallel)
        except ValueError as e:
            raise SystemExit(str(e))
    pp_mesh = None
    if args.pipeline_parallel:
        if cfg.model_family != "transformer":
            raise SystemExit(
                "--pipeline-parallel applies to the transformer family "
                "only (the LSTM stacks are too shallow to amortize "
                "pipeline bubbles — SURVEY §2.2)"
            )
        if cfg.data_parallel or sp_mesh is not None:
            raise SystemExit(
                "--pipeline-parallel is exclusive with --data-parallel "
                "and --seq-parallel (one strategy per run)"
            )
        if cfg.model.layers % args.pipeline_parallel:
            raise SystemExit(
                f"{cfg.model.layers} decoder layers not divisible by "
                f"--pipeline-parallel {args.pipeline_parallel}"
            )
        from .parallel.pp import make_pp_mesh

        try:
            pp_mesh = make_pp_mesh(args.pipeline_parallel)
        except ValueError as e:
            raise SystemExit(str(e))
    train_d, test_d = _load_or_synth_data(args, cfg)
    h_in, h_out = train_d["past"].shape[1], train_d["future"].shape[1]
    if (h_in, h_out) != (cfg.model.h_in, cfg.model.h_out):
        raise SystemExit(
            f"data windows are {h_in}-in/{h_out}-out but preset "
            f"{cfg.name!r} expects {cfg.model.h_in}-in/{cfg.model.h_out}-out; "
            f"re-run prepare-data with matching --h-in/--h-out"
        )
    if (
        cfg.model_family in ("cross_user", "transformer")
        and cfg.n_other_users
        and train_d.get("other_future") is None
    ):
        print(
            f"note: {cfg.name!r} uses cross-viewer context but the packed "
            f"data has none — re-run prepare-data with --n-other-users "
            f"{cfg.n_other_users} to enable it (training proceeds with "
            f"zero context)"
        )
    if cfg.batch_size > len(train_d["past"]):
        cfg = cfg.replace(batch_size=len(train_d["past"]))
    if cfg.accum > 1 and cfg.batch_size % cfg.accum:
        bs = (cfg.batch_size // cfg.accum) * cfg.accum
        if bs == 0:
            raise SystemExit(
                f"--accum {cfg.accum} exceeds batch size {cfg.batch_size}"
            )
        print(f"rounding batch_size down to {bs} (multiple of --accum)")
        cfg = cfg.replace(batch_size=bs)
    nd = what = None
    if sp_mesh is not None and "data" in sp_mesh.shape:
        # the SP shard_map splits the batch over the auto-filled 'data'
        # axis: round AFTER the dataset/accum clamps above so the final
        # batch is divisible (a ragged batch would die in shard_map)
        nd, what = sp_mesh.shape["data"], "SP data axis"
    elif pp_mesh is not None:
        # PP splits the batch into S microbatches (default schedule)
        nd, what = pp_mesh.shape["stage"], "PP microbatch count"
    if nd is not None:
        # accum_grads slices the batch into `accum` microbatches BEFORE
        # apply_fn runs, so each slice (bs / accum) must itself divide
        # by nd: the requirement is bs % (nd * accum) == 0, not lcm —
        # with gcd(nd, accum) > 1 the lcm admits batches that crash at
        # trace time inside shard_map / pp_decode
        mult = nd * cfg.accum if cfg.accum > 1 else nd
        bs = (cfg.batch_size // mult) * mult
        if bs == 0:
            raise SystemExit(
                f"batch size {cfg.batch_size} too small for the {what} "
                f"({nd}"
                + (f" x --accum {cfg.accum}" if cfg.accum > 1 else "")
                + ")"
            )
        if bs != cfg.batch_size:
            print(
                f"rounding batch_size down to {bs} "
                f"(multiple of {what} {nd})"
            )
            cfg = cfg.replace(batch_size=bs)

    state = None
    if args.resume and args.ckpt_dir:
        opt = TR.make_optimizer(cfg)
        ck = _open_checkpoint(args.ckpt_dir, cfg, resuming=True)
        if ck.latest_step() is not None:
            state = ck.restore(TR.init_state(cfg, fam.init, opt))
            print(f"resumed from step {int(state.step)}")

    extras_fn = getattr(fam, "batch_extras", None)
    fused_tf_fn = getattr(fam, "apply_fused_tf", None)
    fused_ss_fn = getattr(fam, "apply_fused_ss", None)
    apply_fn = fam.apply
    if sp_mesh is not None:
        from .parallel.sp import sp_apply_fn

        apply_fn = sp_apply_fn(sp_mesh)
        fused_tf_fn = fused_ss_fn = None
        print(
            f"sequence parallelism: horizon {cfg.model.h_out} ring-"
            f"sharded over mesh {dict(sp_mesh.shape)}"
        )
    if pp_mesh is not None:
        from .parallel.pp import pp_apply_fn

        apply_fn = pp_apply_fn(pp_mesh)
        fused_tf_fn = fused_ss_fn = None
        print(
            f"pipeline parallelism: {cfg.model.layers} decoder layers "
            f"over {pp_mesh.shape['stage']} stages (GPipe microbatching)"
        )
    if cfg.data_parallel:
        from .parallel import train_loop_dp

        state, history = train_loop_dp(
            cfg, fam.init, fam.apply, train_d,
            eval_data=test_d or None, log_file=args.log_file,
            tb_dir=args.tb_dir,
            checkpoint_dir=args.ckpt_dir, state=state, extras_fn=extras_fn,
            fused_tf_fn=fused_tf_fn, fused_ss_fn=fused_ss_fn,
        )
    else:
        state, history = TR.train_loop(
            cfg, fam.init, apply_fn, train_d,
            eval_data=test_d or None, log_file=args.log_file,
            tb_dir=args.tb_dir,
            checkpoint_dir=args.ckpt_dir, state=state, extras_fn=extras_fn,
            fused_tf_fn=fused_tf_fn, fused_ss_fn=fused_ss_fn,
        )
    if history:
        print(json.dumps(history[-1]))


def cmd_eval(args):
    from . import evaluate as E
    from . import train as TR
    from .models import get_family

    cfg = _preset_cfg(args)
    fam = get_family(cfg.model_family)
    opt = TR.make_optimizer(cfg)
    ck = _open_checkpoint(args.ckpt_dir, cfg)
    state = ck.restore(TR.init_state(cfg, fam.init, opt))
    _, test_d = _load_or_synth_data(args, cfg)
    res = E.evaluate(
        state.params, cfg, fam.apply, test_d,
        extras_fn=getattr(fam, "batch_extras", None),
    )
    if args.plot:
        import jax.numpy as jnp

        from . import baselines, infer, plots

        pers = baselines.persistence(
            jnp.asarray(test_d["past"]), cfg.model.h_out
        )
        pers_res = E.evaluate_predictions(np.asarray(pers), test_d["future"])
        curve_png = plots.plot_error_by_step(
            {
                cfg.name: res["error_by_step_deg"],
                "persistence": pers_res["error_by_step_deg"],
            },
            f"{args.plot}_curve.png",
            rate_hz=cfg.rate_hz,
        )
        pred = infer.predict_batch(
            state.params, cfg, fam.apply,
            {k: jnp.asarray(v[:1]) for k, v in test_d.items() if k != "future"},
            None, getattr(fam, "batch_extras", None),
        )
        traj_png = plots.plot_trajectory(
            test_d["past"][0], test_d["future"][0], np.asarray(pred[0]),
            f"{args.plot}_traj.png", rate_hz=cfg.rate_hz,
        )
        print(f"plots: {curve_png}, {traj_png}", file=sys.stderr)
    if args.json:
        print(json.dumps(res))
    else:
        print(E.comparison_table({cfg.name: res}))


def cmd_serve_bench(args):
    import time

    import jax
    import jax.numpy as jnp

    from . import infer
    from .models import get_family

    cfg = _preset_cfg(args)
    fam = get_family(cfg.model_family)
    params = fam.init(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    past = rng.normal(size=(args.batch, cfg.model.h_in, 3)).astype(np.float32)
    past /= np.linalg.norm(past, axis=-1, keepdims=True)
    batch = {"past": jnp.asarray(past)}
    with_peers = (
        cfg.model_family in ("cross_user", "transformer")
        and cfg.n_other_users > 0
    )
    if with_peers:
        # bench what the config actually serves: peer context included
        peers = rng.normal(
            size=(args.batch, cfg.n_other_users, cfg.model.h_out, 3)
        ).astype(np.float32)
        peers /= np.linalg.norm(peers, axis=-1, keepdims=True)
        batch["other_future"] = jnp.asarray(peers)
    serve = infer.make_predict_fn(
        params, cfg, fam.apply, with_tiles=True, impl=args.impl,
        extras_fn=getattr(fam, "batch_extras", None),
    )
    t0 = time.time()
    jax.block_until_ready(serve(batch))
    print(f"compile {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for _ in range(args.iters):
        out = serve(batch)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "viewers_per_sec": round(args.batch * args.iters / dt, 1),
                "batch": args.batch,
                "horizon": cfg.model.h_out,
                "peers": cfg.n_other_users if with_peers else 0,
            }
        )
    )


def cmd_predict(args):
    """One-shot offline prediction (SURVEY.md §3.3): the last H_in
    observed frames of each viewer trace go in; predicted (yaw, pitch)
    trajectories in degrees — and optionally the unioned prefetch tile
    set — come out as one JSON line per viewer. Peer-consuming families
    condition on other viewers' frames past the window end (known at
    serve time in the on-demand scenario, paper §III.C)."""
    import jax.numpy as jnp

    from . import geometry, infer
    from .models import get_family

    cfg = _preset_cfg(args)
    fam = get_family(cfg.model_family)
    if args.peer_group:
        if cfg.model_family not in ("transformer", "cross_user") \
                or args.peers == 0:
            raise SystemExit(
                "--peer-group is the peer-consuming families' shared-"
                "peer tier; needs a transformer or cross_user preset "
                "and K > 0 peers"
            )
        if args.at_frame is None:
            raise SystemExit(
                "--peer-group requires --at-frame: one shared playback "
                "position defines the per-video peer span"
            )
    if args.params:
        from . import serving as SV

        params = SV.load_exported_params(args.params, cfg, fam)
    else:
        from . import train as TR

        opt = TR.make_optimizer(cfg)
        ck = _open_checkpoint(args.ckpt_dir, cfg)
        params = ck.restore(TR.init_state(cfg, fam.init, opt)).params

    if args.traces:
        from . import datasets as DSETS

        store = DSETS.load_dataset(
            args.traces, fmt=args.dataset_format, rate_hz=cfg.rate_hz
        )
    else:
        from . import traces as T

        store = T.synthetic_store(
            n_users=8, n_videos=1, n_frames=600, rate_hz=cfg.rate_hz,
            seed=cfg.seed + 1,
        )

    extras = getattr(fam, "batch_extras", None)
    k_peers = args.peers
    if k_peers < 0:
        k_peers = cfg.n_other_users if extras is not None else 0
    h_in, h_out = cfg.model.h_in, cfg.model.h_out
    if args.peer_group and not k_peers:
        raise SystemExit("--peer-group with an effective K of 0 peers")

    rows, pasts, peer_blocks, peer_masks = [], [], [], []
    for tr in store.traces:
        end = args.at_frame if args.at_frame is not None else len(tr.xyz)
        if end < h_in or end > len(tr.xyz):
            print(
                f"skipping {tr.user}/{tr.video}: window end {end} outside "
                f"[{h_in}, {len(tr.xyz)}]",
                file=sys.stderr,
            )
            continue
        pasts.append(tr.xyz[end - h_in:end])
        if k_peers and not args.peer_group:
            peers = np.zeros((k_peers, h_out, 3), np.float32)
            mask = np.zeros((k_peers,), bool)
            got = 0
            for p in store.others(tr):
                if len(p.xyz) >= end + h_out:
                    peers[got] = p.xyz[end:end + h_out]
                    mask[got] = True
                    got += 1
                    if got == k_peers:
                        break
            peer_blocks.append(peers)
            peer_masks.append(mask)
        rows.append(
            {
                "user": tr.user,
                "video": tr.video,
                "frame": end,
                "t_s": round(end / tr.rate_hz, 3),
                "rate_hz": tr.rate_hz,
                "horizon": h_out,
            }
        )
    if not rows:
        raise SystemExit("no trace long enough for a full input window")

    fetch_union = None  # grouped path: horizon-unioned prefetch per row
    if args.peer_group:
        # GROUP-shared peer serving (the peer-dedup production path):
        # one peer set per video — the first K full-span traces of the
        # video at --at-frame — one peer K/V copy per video on-device
        from . import serving as SV

        end = args.at_frame
        keys = [r["video"] for r in rows]
        sets, masks = {}, {}
        for video in dict.fromkeys(keys):
            peers = np.zeros((k_peers, h_out, 3), np.float32)
            m = np.zeros((k_peers,), np.float32)
            got = 0
            for tr in store.traces:
                if tr.video != video or len(tr.xyz) < end + h_out:
                    continue
                peers[got] = tr.xyz[end:end + h_out]
                m[got] = 1.0
                got += 1
                if got == k_peers:
                    break
            sets[video], masks[video] = peers, m
        gfn = SV.make_grouped_serve_fn(
            params, cfg, fam, with_tiles=args.tiles,
            tile_rows=args.tile_rows, tile_cols=args.tile_cols,
            fov_deg=args.fov, impl=args.impl,
        )
        host = SV.grouped_predict(gfn, np.stack(pasts), keys, sets, masks)
        yaw = np.degrees(host["yaw"])
        pitch = np.degrees(host["pitch"])
        fetch_union = host.get("prefetch")
        tile_mask = None
        group_used = {v: int(m.sum()) for v, m in masks.items()}
    else:
        batch = {"past": jnp.asarray(np.stack(pasts))}
        if k_peers:
            batch["other_future"] = jnp.asarray(np.stack(peer_blocks))
            batch["other_mask"] = jnp.asarray(np.stack(peer_masks))
        serve = infer.make_predict_fn(
            params, cfg, fam.apply, with_tiles=args.tiles,
            tile_rows=args.tile_rows, tile_cols=args.tile_cols,
            fov_deg=args.fov, extras_fn=extras, impl=args.impl,
        )
        out = serve(batch)
        xyz, tile_mask = out if args.tiles else (out, None)
        yaw, pitch = geometry.xyz_to_euler(xyz)
        yaw = np.degrees(np.asarray(yaw))
        pitch = np.degrees(np.asarray(pitch))

    fh = open(args.out, "w") if args.out else sys.stdout
    try:
        for i, row in enumerate(rows):
            row["yaw_deg"] = [round(float(v), 3) for v in yaw[i]]
            row["pitch_deg"] = [round(float(v), 3) for v in pitch[i]]
            if k_peers:
                row["peers_used"] = (
                    group_used[row["video"]] if args.peer_group
                    else int(peer_masks[i].sum())
                )
            fetch = None
            if tile_mask is not None:
                fetch = np.any(np.asarray(tile_mask[i]), axis=0)
            elif fetch_union is not None:
                fetch = fetch_union[i]
            if fetch is not None:
                row["prefetch_tiles"] = np.nonzero(fetch)[0].tolist()
                row["grid"] = f"{args.tile_rows}x{args.tile_cols}"
            fh.write(json.dumps(row) + "\n")
    finally:
        if args.out:
            fh.close()
            print(f"wrote {len(rows)} predictions → {args.out}",
                  file=sys.stderr)


def cmd_serve(args):
    """Streaming-prefetch simulation (SURVEY.md §3.3 + paper §I): decode
    the test split, build tile prefetch sets from the predictions, and
    report how often the viewer's true tile was prefetched vs the
    bandwidth spent — for the model and the hold-last baseline."""
    import jax.numpy as jnp

    from . import baselines, infer
    from . import train as TR
    from .models import get_family

    cfg = _preset_cfg(args)
    fam = get_family(cfg.model_family)
    opt = TR.make_optimizer(cfg)
    ck = _open_checkpoint(args.ckpt_dir, cfg)
    state = ck.restore(TR.init_state(cfg, fam.init, opt))
    _, test_d = _load_or_synth_data(args, cfg)

    kw = dict(
        tile_rows=args.tile_rows, tile_cols=args.tile_cols, fov_deg=args.fov
    )
    pred = infer.predict_batch(
        state.params, cfg, fam.apply,
        {"past": jnp.asarray(test_d["past"])},
        None, getattr(fam, "batch_extras", None),
    )
    true = jnp.asarray(test_d["future"])
    hit, tiles = infer.prefetch_accuracy(pred, true, **kw)
    pers = baselines.persistence(
        jnp.asarray(test_d["past"]), cfg.model.h_out
    )
    hit_p, tiles_p = infer.prefetch_accuracy(pers, true, **kw)
    print(
        json.dumps(
            {
                "model_hit_rate": round(float(hit), 4),
                "model_tiles_per_frame": round(float(tiles), 2),
                "persistence_hit_rate": round(float(hit_p), 4),
                "persistence_tiles_per_frame": round(float(tiles_p), 2),
                "n_windows": int(test_d["past"].shape[0]),
                "horizon": cfg.model.h_out,
                "grid": f"{args.tile_rows}x{args.tile_cols}",
                "fov_deg": args.fov,
            }
        )
    )


def cmd_stream_sim(args):
    from . import infer
    from . import train as TR
    from .models import get_family

    cfg = _preset_cfg(args)
    fam = get_family(cfg.model_family)
    opt = TR.make_optimizer(cfg)
    ck = _open_checkpoint(args.ckpt_dir, cfg)
    state = ck.restore(TR.init_state(cfg, fam.init, opt))
    if args.traces:
        from . import datasets as DSETS

        store = DSETS.load_dataset(
            args.traces, fmt=args.dataset_format, rate_hz=cfg.rate_hz
        )
    else:
        from . import traces as T

        store = T.synthetic_store(
            n_users=8, n_videos=1, n_frames=600, rate_hz=cfg.rate_hz,
            seed=cfg.seed + 1,
        )
    extras = getattr(fam, "batch_extras", None)
    n_peers = args.peers
    if n_peers < 0:  # auto: preset K for peer-consuming families
        n_peers = cfg.n_other_users if extras is not None else 0
    res = infer.stream_simulation(
        state.params, cfg, fam.apply,
        [t.xyz for t in store.traces],
        deadlines=tuple(int(x) for x in args.deadlines.split(",")),
        fov_deg=args.fov, impl=args.impl,
        extras_fn=extras, n_peers=n_peers,
    )
    print(json.dumps(res))


def cmd_serve_daemon(args):
    """Online serving: dynamic batching + sessions + tile prefetch over
    line-JSON TCP (serving.py). Loads params from an orbax checkpoint or
    a flat `export` npz (numpy-only hosts)."""
    from . import serving
    from . import train as TR
    from .models import get_family

    gwarm = None
    if args.grouped_warmup:
        # validate BEFORE the (possibly slow) params load
        try:
            gwarm = [
                tuple(int(v) for v in part.lower().split("x"))
                for part in args.grouped_warmup.split(",")
            ]
            if any(len(p) != 2 or p[0] < 1 or p[1] < 1 for p in gwarm):
                raise ValueError
        except ValueError:
            raise SystemExit(
                f"--grouped-warmup wants 'ROWSxGROUPS[,...]' with "
                f"positive integers, got {args.grouped_warmup!r}"
            )
    cfg = _preset_cfg(args)
    fam = get_family(cfg.model_family)
    if args.params:
        params = serving.load_exported_params(args.params, cfg, fam)
    else:
        opt = TR.make_optimizer(cfg)
        ck = _open_checkpoint(args.ckpt_dir, cfg)
        params = ck.restore(TR.init_state(cfg, fam.init, opt)).params
    mesh = None
    if args.data_parallel:
        from .parallel import make_mesh

        mesh = make_mesh()
    server = serving.serve_daemon(
        params, cfg, fam,
        host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        with_tiles=not args.no_tiles,
        tile_rows=args.tile_rows, tile_cols=args.tile_cols,
        fov_deg=args.fov, impl=args.impl, mesh=mesh,
        pipeline_depth=args.pipeline_depth,
        grouped_warmup=gwarm,
    )
    print(
        json.dumps(
            {
                "listening": f"{args.host}:{server.server_address[1]}",
                "preset": cfg.name,
                "h_in": cfg.model.h_in,
                "h_out": cfg.model.h_out,
                "extras": sorted(server.batcher.extra_specs),
                "max_batch": args.max_batch,
            }
        ),
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.batcher.stop()
        print(json.dumps(server.batcher.stats()), file=sys.stderr)


def cmd_export(args):
    """Flatten a checkpoint's params into one npz (keys like
    'encoder.0.w') so serving hosts load with numpy alone — no orbax,
    no training deps."""
    import jax

    from . import train as TR
    from .models import get_family

    cfg = _preset_cfg(args)
    fam = get_family(cfg.model_family)
    opt = TR.make_optimizer(cfg)
    ck = _open_checkpoint(args.ckpt_dir, cfg)
    state = ck.restore(TR.init_state(cfg, fam.init, opt), step=args.step)
    from .serving import flat_param_items

    flat = {k: np.asarray(v) for k, v in flat_param_items(state.params)}
    np.savez(args.out, **flat)
    print(
        f"exported {len(flat)} arrays "
        f"({sum(a.nbytes for a in flat.values())/1e6:.2f} MB) → {args.out}"
    )


def cmd_extract_features(args):
    """§3.4 driver: per-video frame sources → cached per-frame feature
    tensors for models.fusion (features.equirect.extract_clip_features:
    decode on host, saliency/motion + Pallas conv+resize on device).

    Host video decode is the throughput cliff (SURVEY.md §7 stage 8),
    so it runs on a prefetch thread: while the device computes video
    N's features, the host decodes video N+1. Device dispatch is async,
    so compute also overlaps the np.asarray readback of the previous
    clip."""
    from concurrent.futures import ThreadPoolExecutor

    import jax

    from .features import equirect as FE

    params = FE.init_conv_features(jax.random.PRNGKey(args.seed))

    def decode(fname):
        path = os.path.join(args.frames_dir, fname)
        video = os.path.splitext(fname)[0]
        try:
            frames = FE.decode_frames(
                path, max_frames=args.max_frames, stride=args.stride
            )
        except (RuntimeError, ValueError) as e:
            return video, None, f"skipping {fname}: {e}"
        if frames.size == 0:
            return video, None, f"skipping {fname}: no frames"
        return video, frames, None

    files = [
        f for f in sorted(os.listdir(args.frames_dir))
        if os.path.isfile(os.path.join(args.frames_dir, f))
    ]
    feats = {}
    with ThreadPoolExecutor(max_workers=1) as pool:
        # bounded one-ahead prefetch: submitting every decode upfront
        # would pin all decoded (T,H,W,3) arrays in memory at once
        pending = pool.submit(decode, files[0]) if files else None
        for i in range(len(files)):
            fut = pending
            pending = (
                pool.submit(decode, files[i + 1])
                if i + 1 < len(files)
                else None
            )
            video, frames, err = fut.result()
            if err:
                print(err)
                continue
            f = FE.extract_clip_features(params, frames)
            feats[video] = np.asarray(f, np.float32)
            print(f"{video}: {frames.shape[0]} frames -> {feats[video].shape}")
    if not feats:
        raise SystemExit(f"no decodable frame sources in {args.frames_dir}")
    np.savez_compressed(args.out, **feats)
    print(f"wrote {len(feats)} videos -> {args.out}")


def cmd_inspect_traces(args):
    """Report what the dataset adapters WOULD do with each file: parsed
    shape, sniffed layout, sampling-rate estimate, column ranges, and
    quaternion-norm / angle-unit sanity checks. The adapters' column
    layouts are fixture-verified only (no public dataset is reachable
    in the build environment), so users should eyeball this against
    their data before trusting prepare-data (RESULTS.md caveat)."""
    from . import datasets as DS
    from .native import parse_trace_bytes

    if getattr(args, "validate", False):
        fmt = args.dataset_format
        res = DS.validate_dataset(args.traces, fmt, rate_hz=args.rate)
        n_fail = 0
        for rep in res["files"]:
            rel = os.path.relpath(rep["path"], args.traces)
            if rep["errors"]:
                n_fail += 1
                print(f"FAIL {rel} [{rep['fmt'] or '?'}]")
                for e in rep["errors"]:
                    print(f"     error: {e}")
            else:
                extra = f" {rep.get('rate_hz')} Hz" if rep.get("rate_hz") else ""
                print(f"ok   {rel} [{rep['fmt']}] {rep['rows']} rows{extra}")
            for w in rep["warnings"]:
                print(f"     warn: {w}")
        for w in res["dir_warnings"]:
            print(f"warn: {w}")
        total = len(res["files"])
        print(
            f"{total - n_fail}/{total} files valid"
            + ("" if res["ok"] else " — VALIDATION FAILED")
        )
        if not res["ok"]:
            raise SystemExit(2)
        return

    files = [
        p
        for p in sorted(
            glob.glob(os.path.join(args.traces, "**/*.*"), recursive=True)
        )
        if os.path.isfile(p)
    ]
    if not files:
        raise SystemExit(f"no files under {args.traces}")
    shown = parsed = 0
    for path in files:
        if shown >= args.limit:
            print(f"... ({len(files) - shown} more files)")
            break
        rel = os.path.relpath(path, args.traces)
        if path.endswith(".json"):
            arr = DS._load_json_trace(path)
            if arr is None:
                print(f"{rel}: unparseable JSON trace")
                shown += 1
                continue
        else:
            try:
                with open(path, "rb") as f:
                    arr = parse_trace_bytes(f.read())
            except (OSError, ValueError) as e:
                print(f"{rel}: unparseable ({e})")
                shown += 1
                continue
        shown += 1
        if arr.shape[0] < 2:
            print(f"{rel}: {arr.shape} — too short to analyze")
            continue
        try:
            fmt = DS.sniff_format(arr)
        except ValueError as e:
            print(f"{rel}: {arr.shape} — {e}")
            continue
        parsed += 1
        spec = DS.FORMATS[fmt]
        ts = arr[:, spec.t_col]
        dt = np.diff(ts)
        dt = dt[dt > 0]
        rate = f"{1.0 / np.median(dt):.1f} Hz" if dt.size else "n/a"
        notes = []
        if spec.kind == "quat":
            qn = np.linalg.norm(arr[:, list(spec.cols)], axis=1)
            notes.append(
                f"quat |q| in [{qn.min():.3f}, {qn.max():.3f}]"
            )
        else:
            yaw = arr[:, spec.cols[0]]
            notes.append(
                f"yaw range [{yaw.min():.2f}, {yaw.max():.2f}]"
                f" ({'deg' if spec.degrees else 'rad'})"
            )
            if not spec.degrees and np.abs(yaw).max() > 1.05 * np.pi:
                notes.append(
                    "CAUTION: |yaw| > pi — data may use a [0, 2pi) "
                    "convention the adapters do not expect"
                )
        if arr.shape[1] >= 5 and spec.kind == "euler":
            # sniffing only accepts quat layouts with |q| within 0.05 of
            # unit, so files that fell through here may be CORRUPTED or
            # unnormalized quaternion logs — surface how close they came
            qn5 = np.linalg.norm(arr[:, 1:5], axis=1)
            extra = ""
            if 0.3 < float(np.median(qn5)) < 3.0:
                extra = (
                    f" (cols 1-4 have |q| median {np.median(qn5):.2f} — "
                    f"possibly non-unit quaternions; renormalize upstream)"
                )
            notes.append(
                "CAUTION: >=5 columns but no unit-quaternion block found; "
                "the euler guess may be wrong — check --dataset-format"
                + extra
            )
        if not np.all(np.diff(ts) >= 0):
            notes.append("WARNING: non-monotonic timestamps")
        print(
            f"{rel}: {arr.shape[0]} rows x {arr.shape[1]} cols -> "
            f"format={fmt}, rate~{rate}; " + "; ".join(notes)
        )
    print(
        f"\n{parsed}/{shown} shown files parse cleanly. If a layout guess "
        f"is wrong, pass prepare-data --dataset-format explicitly."
    )


def cmd_presets(_args):
    from .config import PRESETS

    for name, cfg in PRESETS.items():
        m = cfg.model
        print(
            f"{name:<24} family={cfg.model_family:<12} "
            f"h_in={m.h_in} h_out={m.h_out} hidden={m.hidden} layers={m.layers}"
        )


def main(argv=None):
    args = _build_parser().parse_args(argv)
    {
        "prepare-data": cmd_prepare_data,
        "train": cmd_train,
        "eval": cmd_eval,
        "predict": cmd_predict,
        "serve": cmd_serve,
        "stream-sim": cmd_stream_sim,
        "serve-daemon": cmd_serve_daemon,
        "export": cmd_export,
        "serve-bench": cmd_serve_bench,
        "extract-features": cmd_extract_features,
        "inspect-traces": cmd_inspect_traces,
        "presets": cmd_presets,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
