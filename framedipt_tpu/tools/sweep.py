"""Multirun sweeper: the hydra basic-sweeper + joblib-launcher equivalent.

The reference drives batch eval protocols (5 samples x strategies x loops)
through hydra's ``-m`` sweeper with a joblib launcher and maps each job to
a GPU via ``hydra.job.num`` (/root/reference/config/base.yaml:3-4,149-154,
experiments/utils.py:55-85). This is the same capability without hydra:

    python -m framedipt_tpu.tools.sweep --jobs 2 -- \
        python -m framedipt_tpu.experiments.inference \
        inference.diffusion.num_t=2,5 inference.inpainting_samples.samples=1,3

Every ``key=v1,v2,...`` argument after ``--`` is treated as a sweep axis
(hydra's choice-sweep syntax); the cartesian product defines the job list.
Values containing ``[`` are passed through verbatim (list-typed overrides).
Each job runs as a subprocess with:

- the expanded single-value overrides substituted in place,
- ``FRAMEDIPT_JOB_NUM=<i>`` exported (the ``hydra.job.num`` equivalent:
  CLIs append it to run names / output dirs),
- round-robin device pinning over ``--devices`` (the TPU analogue of the
  reference's GPUtil pick-by-job-num) via ``TPU_VISIBLE_DEVICES``,
- at most ``--jobs`` subprocesses in flight (joblib n_jobs equivalent).

Exit status is non-zero if any job fails; per-job logs go to
``--log_dir`` (default: ``sweep_logs/``) as ``job_<i>.log``.
"""
from __future__ import annotations

import argparse
import itertools
import os
import pathlib
import subprocess
import sys
import time

from framedipt_tpu.tools.log import get_logger

logger = get_logger()


def split_sweep_args(
    argv: list[str],
) -> tuple[list[str], list[tuple[int, str, list[str]]]]:
    """Partition a command into fixed args and sweep axes.

    Returns (template, axes) where template contains a placeholder ``None``
    per swept position and axes are (position, key, values)."""
    template: list[str] = []
    axes: list[tuple[int, str, list[str]]] = []
    for i, arg in enumerate(argv):
        if "=" in arg and "," in arg and "[" not in arg:
            key, _, raw = arg.partition("=")
            axes.append((i, key, raw.split(",")))
        template.append(arg)
    return template, axes


def expand_jobs(argv: list[str]) -> list[list[str]]:
    """Cartesian product of all sweep axes -> per-job argv lists."""
    template, axes = split_sweep_args(argv)
    if not axes:
        return [list(template)]
    jobs = []
    for combo in itertools.product(*[vals for _, _, vals in axes]):
        job = list(template)
        for (pos, key, _), val in zip(axes, combo):
            job[pos] = f"{key}={val}"
        jobs.append(job)
    return jobs


def run_sweep(
    base_cmd: list[str],
    jobs: int = 1,
    devices: list[str] | None = None,
    log_dir: pathlib.Path | str = "sweep_logs",
    dry_run: bool = False,
    extra_env: dict[str, str] | None = None,
) -> int:
    """Launch the expanded job list; returns the number of failed jobs."""
    job_cmds = expand_jobs(base_cmd)
    logger.info(f"sweep: {len(job_cmds)} jobs, {jobs} concurrent")
    if dry_run:
        for i, cmd in enumerate(job_cmds):
            print(f"[{i}] {' '.join(cmd)}")
        return 0

    log_dir = pathlib.Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    running: list[tuple[int, subprocess.Popen]] = []
    failures = 0

    def _collect_finished() -> None:
        nonlocal failures
        for idx, proc in [t for t in running if t[1].poll() is not None]:
            running.remove((idx, proc))
            if proc.returncode != 0:
                failures += 1
                logger.error(
                    f"job {idx} failed (rc={proc.returncode}), "
                    f"see {log_dir}/job_{idx}.log"
                )
            else:
                logger.info(f"job {idx} done")

    def _wait_for_slot(limit: int) -> None:
        # Reap ANY finished job, not the oldest: waiting on running[0]
        # serializes a heterogeneous sweep into synchronized batches while
        # free slots sit idle behind the longest-running job.
        while len(running) >= limit:
            _collect_finished()
            if len(running) >= limit:
                time.sleep(0.2)

    for i, cmd in enumerate(job_cmds):
        _wait_for_slot(max(1, jobs))
        env = dict(os.environ)
        env["FRAMEDIPT_JOB_NUM"] = str(i)
        if devices:
            env["TPU_VISIBLE_DEVICES"] = devices[i % len(devices)]
        env.update(extra_env or {})
        # Popen dup()s the fd; close the parent's copy immediately or a
        # large cartesian sweep exhausts the open-file ulimit mid-run.
        with (log_dir / f"job_{i}.log").open("w") as log:
            running.append(
                (i, subprocess.Popen(
                    cmd, stdout=log, stderr=subprocess.STDOUT, env=env
                ))
            )
        logger.info(f"job {i}: {' '.join(cmd)}")
    _wait_for_slot(1)
    return failures


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--jobs", type=int, default=1,
                    help="max concurrent jobs (joblib n_jobs equivalent)")
    ap.add_argument("--devices", default=None,
                    help="comma list of device ids for round-robin pinning")
    ap.add_argument("--log_dir", default="sweep_logs")
    ap.add_argument("--dry_run", action="store_true",
                    help="print the expanded job list and exit")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the base command with key=v1,v2 axes")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no base command given (everything after --)")
    failures = run_sweep(
        cmd,
        jobs=args.jobs,
        devices=args.devices.split(",") if args.devices else None,
        log_dir=args.log_dir,
        dry_run=args.dry_run,
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
