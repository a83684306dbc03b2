#!/usr/bin/env python
"""Production-cadence, multi-epoch lifecycle run on the chip (VERDICT r3 #2).

The closest buildable stand-in for the real-SpaceNet7 north star: a
synthetic dataset at the REFERENCE's production shape (39 train / 9 val /
12 test labeled AOIs + 20 unlabeled, ~1024^2 scenes — reference
configs/base.yaml:28,47-134), trained through the SHIPPED supervised CLI
with the reference's control flow at scale (LOG_FREQ=100 full-split
in-epoch evals, epoch-end evals, SAVE_CHECKPOINTS — reference
train_supervised.py:84-116), for >= 3 epochs x >= 300 steps, including:

  * a hard SIGKILL mid-epoch-3 (preemption stand-in), then an identical
    restart with TRAINER.RESUME_CHECKPOINT 'latest' — the run discovers
    the epoch-2 checkpoint itself, no epoch named anywhere;
  * a seam-invisibility assertion: the killed run and the resumed run both
    log the same post-resume window (first LOG_FREQ multiple into epoch 3)
    — every metric in that record must match, proving checkpoint +
    loader-schedule + PRNG restoration is exact;
  * steps/s check: per-window `train_time` (window minus in-window evals)
    against bench.py's converged step time;
  * final offline assessment (assessment_change.py) on the artifact.

Usage:  python tools/lifecycle_run.py            # full production shape
        python tools/lifecycle_run.py --scene 128 --multiplier 16  # smoke

Writes a self-contained report (JSON) plus the raw JSONL logs under
--out-dir; the F1-trajectory summary prints at the end.
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:  # idempotent: tests exec this module in-process
    sys.path.insert(0, str(REPO))

# regime -> (trainer CLI, headline config, trains on unlabeled AOIs too) —
# config choice mirrors tools/convergence_run.py
REGIMES = {
    "supervised": ("train_supervised.py", "siamese", False),
    "dualtask": ("train_supervised_dualtask.py", "dtsiamese", False),
    # alpha0500: supervised factor 0.5 (mmcr_base is consistency-only and
    # cannot learn change labels by design)
    "semisupervised": ("train_semisupervised.py", "siamese_mmcr_alpha0500",
                       True),
}

TRAIN = [f"L15-lftrain{i}" for i in range(39)]
VAL = [f"L15-lfval{i}" for i in range(9)]
TEST = [f"L15-lftest{i}" for i in range(12)]
UNLAB = [f"L15-lfunlab{i}" for i in range(20)]


def ensure_dataset(root: Path, scene: int, hard: bool = False) -> None:
    import shutil

    params = {"scene": scene, "train": TRAIN, "val": VAL, "test": TEST,
              "unlab": UNLAB, "v": 1, "hard": hard}
    marker = root / "lifecycle_gen_params.json"
    if marker.exists() and json.loads(marker.read_text()) == params:
        return
    if root.exists() and not marker.exists():
        # NEVER delete a tree this tool didn't generate
        raise SystemExit(
            f"{root} exists but has no {marker.name}; refusing to "
            f"overwrite a dataset this tool did not generate")
    from multimodal_siamese_cd_tpu.data.synthetic import (
        generate_fixture_dataset,
        generate_hard_dataset,
    )

    t0 = time.time()
    print(f"generating {'HARD ' if hard else ''}synthetic dataset at {root} "
          f"({len(TRAIN)}/{len(VAL)}/{len(TEST)}+{len(UNLAB)} AOIs, "
          f"~{scene}^2 scenes)...", flush=True)
    aois = {a: True for a in TRAIN + VAL + TEST}
    aois.update({a: False for a in UNLAB})
    # generate into a sibling and rename at the end: an interrupted
    # multi-minute generation must not leave a marker-less tree at `root`
    # that the guard above would then permanently refuse to replace
    tmp = root.with_name(root.name + ".partial")
    if tmp.exists():
        shutil.rmtree(tmp)
    if hard:
        generate_hard_dataset(tmp, scene_size=(scene, scene), aois=aois)
    else:
        generate_fixture_dataset(tmp, scene_size=(scene, scene), aois=aois)
    (tmp / marker.name).write_text(json.dumps(params))
    if root.exists():
        shutil.rmtree(root)
    tmp.rename(root)
    print(f"dataset generated in {time.time() - t0:.0f} s", flush=True)


def overrides(args) -> list:
    return ["DATASET.TRAINING_IDS", repr(TRAIN),
            "DATASET.VALIDATION_IDS", repr(VAL),
            "DATASET.TEST_IDS", repr(TEST),
            "DATASET.UNLABELED_IDS", repr(UNLAB),
            "DATALOADER.TRAINING_MULTIPLIER", str(args.multiplier),
            "LOG_FREQ", str(args.log_freq),
            "TRAINER.EPOCHS", str(args.epochs),
            "AUGMENTATION.CROP_SIZE", str(args.crop),
            "SAVE_CHECKPOINTS", repr(list(range(1, args.epochs + 1)))]


def plan(regime: str, multiplier: int, log_freq: int, epochs: int,
         batch: int | None = None) -> dict:
    """Derive the run plan from the REGIME'S CONFIG, not assumptions.

    Batch size comes from the experiment grid (the semisup configs pin
    TRAINER.BATCH_SIZE 4, not base.yaml's 8 — the round-4 first semisup
    attempt assumed 8, predicted half the real epoch length, and SIGKILLed
    an epoch too early); semisup epochs also count the 20 unlabeled AOIs.
    Unit-tested in tests/test_aux.py.
    """
    from multimodal_siamese_cd_tpu.config import load_cfg

    _, config, with_unlabeled = REGIMES[regime]
    batch = batch or load_cfg(config).TRAINER.BATCH_SIZE
    n_train_aois = len(TRAIN) + (len(UNLAB) if with_unlabeled else 0)
    steps_per_epoch = (n_train_aois * multiplier) // batch
    resume_epoch = epochs - 1
    resume_step = resume_epoch * steps_per_epoch
    # first LOG_FREQ multiple inside the final epoch: both runs log it
    seam_step = ((resume_step // log_freq) + 1) * log_freq
    assert seam_step < epochs * steps_per_epoch, \
        "final epoch too short to contain a log window; raise --multiplier"
    return {"batch": batch, "steps_per_epoch": steps_per_epoch,
            "resume_epoch": resume_epoch, "seam_step": seam_step}


def launch(cmd, log_path: Path):
    print("running:", " ".join(cmd), flush=True)
    logf = open(log_path, "a")
    return subprocess.Popen(cmd, cwd=REPO, stdout=logf, stderr=logf), logf


def parse_jsonl(text: str) -> list:
    records = []
    for line in text.splitlines():
        try:
            records.append(json.loads(line))
        except json.JSONDecodeError:
            pass  # mid-write tail line
    return records


def read_jsonl(path: Path) -> list:
    return parse_jsonl(path.read_text()) if path.exists() else []


def window_rates(recs, steps_per_epoch, batch, start_step=0):
    """Per-window patches/s with HONEST step counts.

    A window summary at step ``s`` covers the steps since
    ``max(previous summary, epoch start)`` — the trainer's train_time
    accumulator resets at epoch starts as well as after each window
    (trainers.py _run_epochs), so dividing every window by LOG_FREQ
    undercounts epoch-first windows. The first window of each phase is
    dropped outright: it includes the jit compile (~3-5 min on the
    tunneled TPU).
    """
    rates, prev, first = [], start_step, True
    for r in recs:
        if "train_time" not in r or r.get("step") is None:
            continue
        s = r["step"]
        epoch_start = ((s - 1) // steps_per_epoch) * steps_per_epoch
        n = s - max(prev, epoch_start)
        prev = s
        if first:
            first = False
            continue
        if n > 0 and r["train_time"] > 0:
            rates.append(n * batch / r["train_time"])
    return rates


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--regime", choices=sorted(REGIMES), default="supervised")
    p.add_argument("--scene", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=3)
    # 39 AOIs x 128 / batch 8 = 624 steps/epoch (>= 300, and gcd(624,100)=4
    # so the auto scan-fusion plan can pick k>1 at production cadence)
    p.add_argument("--multiplier", type=int, default=128)
    p.add_argument("--log-freq", type=int, default=100)
    p.add_argument("--batch", type=int, default=None,
                   help="override TRAINER.BATCH_SIZE (default: the regime "
                        "config's own value — semisup configs pin 4, not 8)")
    p.add_argument("--crop", type=int, default=256,
                   help="AUGMENTATION.CROP_SIZE (production default 256; "
                        "shrink for smoke runs with small scenes)")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--kill-timeout", type=float, default=7200,
                   help="abort if the kill window never arrives (s)")
    p.add_argument("--hard", action="store_true",
                   help="hard-mode fixture (SpaceNet7-realistic statistics; "
                        "synthetic.generate_hard_dataset, calibrated "
                        "signal 0.3)")
    args = p.parse_args()

    script, config, with_unlabeled = REGIMES[args.regime]
    tag = f"{args.scene}{'_hard' if args.hard else ''}"
    data = Path(args.data_dir or f"/tmp/lifecycle_ds{tag}")
    out = Path(args.out_dir or f"/tmp/lifecycle_out{tag}_{args.regime}")
    out.mkdir(parents=True, exist_ok=True)
    ensure_dataset(data, args.scene, hard=args.hard)

    run_plan = plan(args.regime, args.multiplier, args.log_freq, args.epochs,
                    batch=args.batch)
    batch = run_plan["batch"]
    steps_per_epoch = run_plan["steps_per_epoch"]
    resume_epoch = run_plan["resume_epoch"]
    seam_step = run_plan["seam_step"]
    print(f"regime {args.regime}: batch {batch}, "
          f"{steps_per_epoch} steps/epoch x {args.epochs} epochs", flush=True)

    jsonl = out / "logs" / f"{config}.jsonl"
    jsonl.unlink(missing_ok=True)
    console = out / "console.log"
    console.unlink(missing_ok=True)

    base_cmd = [sys.executable, str(REPO / script),
                "-c", config, "-p", "lifecycle", "-o", str(out),
                "-d", str(data)] + overrides(args)
    if args.batch is not None:
        base_cmd += ["TRAINER.BATCH_SIZE", str(args.batch)]

    # ---- phase A: train, then SIGKILL mid-final-epoch --------------------
    # the tunneled TPU backend has observed transient stalls (>15 min) that
    # trip the trainer's own wedge watchdog (rc=2); a pre-window abort is
    # rig flakiness, not a framework failure — retry with a clean log
    killed_at = None
    for attempt in range(3):
        jsonl.unlink(missing_ok=True)
        t0 = time.time()
        proc, logf = launch(base_cmd, console)
        try:
            while True:
                if proc.poll() is not None:
                    # re-read the log BEFORE classifying the exit: a short
                    # run can log the seam window and finish inside one
                    # 5-s poll gap, which is not a pre-window abort — it
                    # means the seam sits too close to the end to kill
                    steps = [r.get("step") for r in read_jsonl(jsonl)
                             if "train_time" in r]
                    if any(s is not None and s >= seam_step for s in steps):
                        raise SystemExit(
                            "phase A FINISHED before the SIGKILL could land "
                            f"(seam step {seam_step} too close to the run's "
                            "end for the 5 s poll) — raise --multiplier so "
                            "the final epoch extends past the seam window")
                    print(f"phase A attempt {attempt + 1} exited "
                          f"rc={proc.returncode} before the kill window "
                          f"(step {seam_step}) — see {console}", flush=True)
                    break
                # wait for the WINDOW SUMMARY record (train_time key): it is
                # written after the window's training/validation F1 records,
                # so the seam step's full record triplet is on disk before
                # the kill
                steps = [r.get("step") for r in read_jsonl(jsonl)
                         if "train_time" in r]
                if any(s is not None and s >= seam_step for s in steps):
                    killed_at = max(s for s in steps if s is not None)
                    proc.send_signal(signal.SIGKILL)  # preemption stand-in
                    proc.wait()
                    break
                if time.time() - t0 > args.kill_timeout:
                    proc.send_signal(signal.SIGKILL)
                    proc.wait()
                    raise SystemExit("phase A never reached the kill window")
                time.sleep(5)
        finally:
            logf.close()
        if killed_at is not None:
            break
    else:
        raise SystemExit("phase A failed before the kill window on all "
                         f"attempts — see {console}")
    # SIGKILL can land mid-write: drop any partial trailing line now so
    # phase B's first appended record never splices onto it, and parse
    # phase A from the SAME truncated bytes so the record counts line up
    raw_a = jsonl.read_bytes()
    nl = raw_a.rfind(b"\n")
    jsonl_a_bytes = raw_a[:nl + 1] if nl >= 0 else b""
    phase_a = parse_jsonl(jsonl_a_bytes.decode())
    print(f"phase A: SIGKILLED after logging step {killed_at} "
          f"({time.time() - t0:.0f} s in)", flush=True)
    ckpt = out / "networks" / f"{config}_checkpoint{resume_epoch}.pt"
    assert ckpt.exists(), f"epoch-{resume_epoch} checkpoint missing: {ckpt}"

    # ---- phase B: resume from the epoch-(E-1) checkpoint ------------------
    # same transient-wedge tolerance: restore the log to the phase-A
    # snapshot before each attempt so records never duplicate. Phase B is
    # bounded too (the trainer's wedge watchdog only guards the FIRST
    # warmup fetch — a mid-run tunnel wedge would otherwise hang forever):
    # it runs one epoch where phase A ran up to `epochs`, so phase A's
    # own wall time is a generous per-attempt budget
    phase_b_timeout = max(time.time() - t0, 900.0)
    for attempt in range(3):
        jsonl.write_bytes(jsonl_a_bytes)
        t1 = time.time()
        # no epoch named anywhere: the restarted command discovers the
        # newest checkpoint itself (auto-resume, round-5 item 4) — the
        # epoch-(E-1) existence assert above already pinned what 'latest'
        # must resolve to
        proc, logf = launch(
            base_cmd + ["TRAINER.RESUME_CHECKPOINT", "latest"],
            console)
        try:
            rc = proc.wait(timeout=phase_b_timeout)
        except subprocess.TimeoutExpired:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            rc = "wedged"
        logf.close()
        if rc == 0:
            break
        print(f"phase B attempt {attempt + 1} failed rc={rc} — see "
              f"{console}", flush=True)
    else:
        raise SystemExit(f"phase B (resume) failed on all attempts")
    print(f"phase B: resumed run finished ({time.time() - t1:.0f} s)",
          flush=True)
    records = read_jsonl(jsonl)
    phase_b = records[len(phase_a):]

    # ---- seam invisibility: both phases logged the seam window -----------
    def pick(recs, step):
        return [r for r in recs if r.get("step") == step]

    # each log window writes several records at the same step (training F1,
    # validation F1, window summary) — compare them pairwise in order
    a_seam = pick(phase_a, seam_step)
    b_seam = pick(phase_b, seam_step)
    assert a_seam and len(a_seam) == len(b_seam), (
        f"seam step {seam_step} record counts differ "
        f"(A: {len(a_seam)}, B: {len(b_seam)})")
    seam_diffs = {}
    for ra, rb in zip(a_seam, b_seam):
        assert set(ra) == set(rb), f"seam record keys differ: {ra} vs {rb}"
        for key, va in ra.items():
            vb = rb[key]
            if isinstance(va, (int, float)) and isinstance(vb, (int, float)) \
                    and key not in ("time", "train_time") \
                    and not key.startswith("_"):  # wall clocks, sink stamps
                seam_diffs[key] = max(seam_diffs.get(key, 0.0), abs(va - vb))
    bad = {k: d for k, d in seam_diffs.items() if d > 1e-6}
    assert not bad, f"resume seam VISIBLE in metrics: {bad}"
    print(f"seam check OK: step-{seam_step} records identical across "
          f"kill+resume ({sorted(seam_diffs)})", flush=True)

    # ---- steps/s vs bench -------------------------------------------------
    rates = (window_rates(phase_a, steps_per_epoch, batch)
             + window_rates(phase_b, steps_per_epoch, batch,
                            start_step=resume_epoch * steps_per_epoch))
    rate = sorted(rates)[len(rates) // 2] if rates else float("nan")

    # ---- offline assessment on the final artifact -------------------------
    t2 = time.time()
    assess_cmd = [sys.executable, str(REPO / "assessment_change.py"),
                  "-c", config, "-o", str(out), "-d", str(data)] \
        + overrides(args) \
        + ["INFERENCE_CHECKPOINT", str(args.epochs)]
    try:
        r = subprocess.run(assess_cmd, cwd=REPO, capture_output=True,
                           text=True, timeout=phase_b_timeout)
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"offline assessment wedged (> {phase_b_timeout:.0f} s) — "
            "likely a tunnel stall; rerun assessment_change.py manually")
    print(r.stdout[-2000:], flush=True)
    if r.returncode:
        print(r.stderr[-3000:], flush=True)
        raise SystemExit(f"offline assessment failed rc={r.returncode}")
    print(f"offline assessment done ({time.time() - t2:.0f} s)", flush=True)

    # ---- report ------------------------------------------------------------
    def trajectory(recs):
        return [{k: r.get(k) for k in
                 ("step", "epoch", "training F1", "validation F1", "test F1",
                  "loss", "train_time", "time") if k in r}
                for r in recs
                if any(f in r for f in
                       ("training F1", "validation F1", "test F1"))]

    report = {
        "shape": {"scene": args.scene, "aois": [len(TRAIN), len(VAL),
                                                len(TEST), len(UNLAB)],
                  "steps_per_epoch": steps_per_epoch, "epochs": args.epochs,
                  "log_freq": args.log_freq, "batch": batch,
                  "multiplier": args.multiplier},
        "killed_after_step": killed_at, "resume_epoch": resume_epoch,
        "seam_step": seam_step, "seam_max_abs_diff":
            max(seam_diffs.values()) if seam_diffs else None,
        "median_train_patches_per_sec": round(rate, 1),
        "window_rates": [round(x, 1) for x in rates],
        "assessment_tail": r.stdout.strip().splitlines()[-3:],
        "trajectory": trajectory(records),
    }
    (out / "lifecycle_report.json").write_text(json.dumps(report, indent=1))
    print(f"\nreport: {out / 'lifecycle_report.json'}")
    print(f"median train rate {rate:.1f} patches/s "
          f"(bench.py converged: ~333 on TPU)")
    for t in report["trajectory"]:
        f1s = ", ".join(f"{k}={t[k]:.4f}" for k in
                        ("training F1", "validation F1", "test F1") if k in t)
        print(f"  step {t.get('step'):>5} epoch {t.get('epoch'):.2f}  {f1s}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
