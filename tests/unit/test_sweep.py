"""Multirun sweeper tests (hydra basic-sweeper + joblib-launcher equivalent).

Reference capability: hydra ``-m`` choice sweeps with the joblib launcher
and per-job device mapping via ``hydra.job.num``
(/root/reference/config/base.yaml:3-4,149-154,
/root/reference/experiments/utils.py:55-85).
"""
from __future__ import annotations

import json
import pathlib
import sys

from framedipt_tpu.tools.sweep import expand_jobs, run_sweep, split_sweep_args


class TestExpand:
    def test_no_axes_single_job(self):
        cmd = ["python", "x.py", "a=1", "b=hello"]
        assert expand_jobs(cmd) == [cmd]

    def test_cartesian_product(self):
        jobs = expand_jobs(["run", "a=1,2", "fixed=z", "b=x,y,w"])
        assert len(jobs) == 6
        assert jobs[0] == ["run", "a=1", "fixed=z", "b=x"]
        assert jobs[-1] == ["run", "a=2", "fixed=z", "b=w"]
        # every combination appears exactly once
        combos = {(j[1], j[3]) for j in jobs}
        assert len(combos) == 6

    def test_list_valued_override_not_swept(self):
        # hydra list syntax: commas inside [...] are one value, not a sweep.
        cmd = ["run", "lengths=[100,200]", "t=1,2"]
        _, axes = split_sweep_args(cmd)
        assert [k for _, k, _ in axes] == ["t"]
        assert len(expand_jobs(cmd)) == 2
        assert expand_jobs(cmd)[0][1] == "lengths=[100,200]"


class TestRun:
    def _env_dump_cmd(self, out_dir: pathlib.Path) -> list[str]:
        prog = (
            "import json,os,sys;"
            "json.dump({'job': os.environ.get('FRAMEDIPT_JOB_NUM'),"
            "'dev': os.environ.get('TPU_VISIBLE_DEVICES'),"
            "'argv': sys.argv[1:]},"
            f"open(r'{out_dir}'+'/out_'+os.environ['FRAMEDIPT_JOB_NUM']+'.json','w'))"
        )
        return [sys.executable, "-c", prog]

    def test_jobs_get_job_num_and_device_pinning(self, tmp_path):
        cmd = self._env_dump_cmd(tmp_path) + ["t=1,2,3"]
        failures = run_sweep(
            cmd, jobs=2, devices=["0", "1"], log_dir=tmp_path / "logs"
        )
        assert failures == 0
        recs = {}
        for i in range(3):
            recs[i] = json.load(open(tmp_path / f"out_{i}.json"))
        # job numbers exported, overrides expanded one value per job
        assert [recs[i]["argv"][-1] for i in range(3)] == ["t=1", "t=2", "t=3"]
        # round-robin device pinning over the provided device list
        assert [recs[i]["dev"] for i in range(3)] == ["0", "1", "0"]

    def test_failures_counted_and_logged(self, tmp_path):
        cmd = [sys.executable, "-c",
               "import sys; sys.exit(int(sys.argv[1].split('=')[1]))",
               "rc=0,1,0,1"]
        failures = run_sweep(cmd, jobs=4, log_dir=tmp_path / "logs")
        assert failures == 2
        assert sorted(p.name for p in (tmp_path / "logs").glob("*.log")) == [
            f"job_{i}.log" for i in range(4)
        ]

    def test_dry_run_spawns_nothing(self, tmp_path, capsys):
        cmd = self._env_dump_cmd(tmp_path) + ["t=1,2"]
        assert run_sweep(cmd, dry_run=True, log_dir=tmp_path / "logs") == 0
        out = capsys.readouterr().out
        assert "t=1" in out and "t=2" in out
        assert not list(tmp_path.glob("out_*.json"))
