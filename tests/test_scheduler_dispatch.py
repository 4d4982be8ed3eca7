"""Cluster dispatchers scripts/slurm.pl and scripts/queue.pl.

The reference drives every parallel stage through a pluggable job runner
(`$cmd`, reference cmd.sh:12-15) with the calling convention
``<runner> [opts] [JOB=1:N] <logfile> <command...>``.  These tests run
the real dispatcher scripts against *fake* ``sbatch``/``qsub`` binaries
placed on PATH that execute the submitted batch script locally per array
task — exercising option mapping, JOB substitution via the scheduler's
task-id environment variable, per-task logging, failure propagation, and
the local run.pl fallback when no scheduler exists.
"""

import os
import stat
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Executes every task in --array=A-B[%C] by running the script with
# SLURM_ARRAY_TASK_ID set; exits nonzero if any task fails (--wait
# semantics).  Records its argv for option-mapping assertions.
FAKE_SBATCH = """#!/bin/bash
echo "$@" >> "$FAKE_SCHED_LOG"
array=""
script=""
for a in "$@"; do
  case "$a" in
    --array=*) array=${a#--array=};;
    --*) ;;
    *) script=$a;;
  esac
done
if [ -z "$array" ]; then
  bash "$script"; exit $?
fi
array=${array%%\\%*}
lo=${array%-*}; hi=${array#*-}
rc=0
for i in $(seq "$lo" "$hi"); do
  SLURM_ARRAY_TASK_ID=$i bash "$script" || rc=1
done
exit $rc
"""

# SGE flavor: -t A-B, task id env SGE_TASK_ID, -sync y blocks.
FAKE_QSUB = """#!/bin/bash
echo "$@" >> "$FAKE_SCHED_LOG"
trange=""
script=""
while [ $# -gt 0 ]; do
  case "$1" in
    -t) trange=$2; shift 2;;
    -pe) shift 3;;
    -sync|-b|-o|-e|-N|-q|-l|-tc) shift 2;;
    -V|-cwd) shift;;
    *) script=$1; shift;;
  esac
done
if [ -z "$trange" ]; then
  # real SGE sets SGE_TASK_ID to the literal string "undefined" for
  # non-array jobs
  SGE_TASK_ID=undefined bash "$script"; exit $?
fi
lo=${trange%-*}; hi=${trange#*-}
rc=0
for i in $(seq "$lo" "$hi"); do
  SGE_TASK_ID=$i bash "$script" || rc=1
done
exit $rc
"""


def _install_fake(tmp_path, name, body):
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    exe = bindir / name
    exe.write_text(body)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return str(bindir)


def _run(dispatcher, args, path_prepend, tmp_path, cwd=None):
    env = dict(os.environ)
    env["PATH"] = path_prepend + ":" + env["PATH"]
    env["FAKE_SCHED_LOG"] = str(tmp_path / "sched_argv.log")
    return subprocess.run(
        ["perl", os.path.join(REPO, "scripts", dispatcher)] + args,
        capture_output=True, text=True, env=env, cwd=cwd or str(tmp_path))


def test_slurm_array_job_runs_and_logs(tmp_path):
    bindir = _install_fake(tmp_path, "sbatch", FAKE_SBATCH)
    log = tmp_path / "logs" / "echo.JOB.log"
    r = _run("slurm.pl",
             ["--mem", "2G", "--num-threads", "3", "-p", "speech",
              "JOB=1:3", str(log), "echo", "task", "JOB"],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    for i in (1, 2, 3):
        text = (tmp_path / "logs" / ("echo.%d.log" % i)).read_text()
        assert ("task %d" % i) in text
        assert "status 0" in text
    argv = (tmp_path / "sched_argv.log").read_text()
    assert "--array=1-3" in argv
    assert "--mem=2G" in argv
    assert "--cpus-per-task=3" in argv
    assert "--partition=speech" in argv
    assert "--wait" in argv
    # the batch script is materialized next to the logs
    assert (tmp_path / "logs" / "q" / "echo.JOB.sh").exists()


def test_slurm_failure_propagates(tmp_path):
    bindir = _install_fake(tmp_path, "sbatch", FAKE_SBATCH)
    log = tmp_path / "fail.JOB.log"
    r = _run("slurm.pl",
             ["JOB=1:2", str(log), "test", "JOB", "-eq", "1"],
             bindir, tmp_path)
    assert r.returncode != 0
    assert "status 0" in (tmp_path / "fail.1.log").read_text()
    assert "status 1" in (tmp_path / "fail.2.log").read_text()


def test_slurm_falls_back_to_run_pl_without_sbatch(tmp_path):
    # PATH gets an empty bin dir — no sbatch anywhere relevant is fine,
    # but strip the whole PATH down to guarantee absence
    log = tmp_path / "local.JOB.log"
    env = dict(os.environ)
    env["PATH"] = "/usr/bin:/bin"
    r = subprocess.run(
        ["perl", os.path.join(REPO, "scripts", "slurm.pl"),
         "--mem", "2G", "JOB=1:2", str(log), "echo", "local", "JOB"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "running locally via run.pl" in r.stderr
    for i in (1, 2):
        assert ("local %d" % i) in \
            (tmp_path / ("local.%d.log" % i)).read_text()


def test_qsub_array_job_runs_and_logs(tmp_path):
    bindir = _install_fake(tmp_path, "qsub", FAKE_QSUB)
    log = tmp_path / "logs" / "sge.JOB.log"
    r = _run("queue.pl",
             ["-q", "all.q", "--mem", "1G", "--num-threads", "2",
              "JOB=2:4", str(log), "echo", "sge", "JOB"],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    for i in (2, 3, 4):
        text = (tmp_path / "logs" / ("sge.%d.log" % i)).read_text()
        assert ("sge %d" % i) in text
        assert "status 0" in text
    argv = (tmp_path / "sched_argv.log").read_text()
    assert "-t 2-4" in argv
    assert "-q all.q" in argv
    assert "mem_free=1G,ram_free=1G" in argv
    assert "-pe smp 2" in argv
    assert "-sync y" in argv


def test_qsub_failure_propagates(tmp_path):
    bindir = _install_fake(tmp_path, "qsub", FAKE_QSUB)
    log = tmp_path / "qfail.JOB.log"
    r = _run("queue.pl", ["JOB=1:2", str(log), "test", "JOB", "-eq", "2"],
             bindir, tmp_path)
    assert r.returncode != 0
    assert "status 1" in (tmp_path / "qfail.1.log").read_text()
    assert "status 0" in (tmp_path / "qfail.2.log").read_text()


def test_queue_falls_back_to_run_pl_without_qsub(tmp_path):
    log = tmp_path / "qlocal.JOB.log"
    env = dict(os.environ)
    env["PATH"] = "/usr/bin:/bin"
    r = subprocess.run(
        ["perl", os.path.join(REPO, "scripts", "queue.pl"),
         "JOB=1:2", str(log), "echo", "qlocal", "JOB"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "running locally via run.pl" in r.stderr
    for i in (1, 2):
        assert ("qlocal %d" % i) in \
            (tmp_path / ("qlocal.%d.log" % i)).read_text()


def test_slurm_single_job_no_array(tmp_path):
    bindir = _install_fake(tmp_path, "sbatch", FAKE_SBATCH)
    log = tmp_path / "single.log"
    r = _run("slurm.pl", [str(log), "echo", "one-shot"], bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    text = log.read_text()
    assert "one-shot" in text and "status 0" in text
    assert "--array" not in (tmp_path / "sched_argv.log").read_text()


def test_slurm_job_substitution_inside_single_quotes(tmp_path):
    """Args containing a double-quote are single-quoted on the shell
    round-trip; JOB must still substitute (the batch script carries one
    Perl-substituted case branch per task — run.pl semantics — instead
    of relying on a runtime ${TASK_ID} expansion)."""
    bindir = _install_fake(tmp_path, "sbatch", FAKE_SBATCH)
    log = tmp_path / "sq.JOB.log"
    r = _run("slurm.pl",
             ["JOB=1:2", str(log), "sh", "-c", 'echo "quoted JOB"'],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    for i in (1, 2):
        assert ("quoted %d" % i) in \
            (tmp_path / ("sq.%d.log" % i)).read_text()


def test_queue_valueless_flag_does_not_swallow_jobspec(tmp_path):
    bindir = _install_fake(tmp_path, "qsub", FAKE_QSUB)
    log = tmp_path / "vf.JOB.log"
    r = _run("queue.pl",
             ["-cwd", "-V", "JOB=1:2", str(log), "echo", "vf", "JOB"],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    for i in (1, 2):
        assert ("vf %d" % i) in \
            (tmp_path / ("vf.%d.log" % i)).read_text()
    assert "-t 1-2" in (tmp_path / "sched_argv.log").read_text()


def test_job_name_sanitized_for_schedulers(tmp_path):
    # SGE rejects names with a leading digit; both dispatchers sanitize
    bindir = _install_fake(tmp_path, "qsub", FAKE_QSUB)
    log = tmp_path / "10.JOB.log"
    r = _run("queue.pl", ["JOB=1:1", str(log), "echo", "n", "JOB"],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "-N j10.JOB" in (tmp_path / "sched_argv.log").read_text()


def test_command_substitution_runs_exactly_once(tmp_path):
    """The log-header line is written as a literal (printf '%s'), so a
    command is parsed by the shell exactly once per task — an appending
    side effect must appear exactly once."""
    bindir = _install_fake(tmp_path, "sbatch", FAKE_SBATCH)
    side = tmp_path / "side.txt"
    log = tmp_path / "once.JOB.log"
    r = _run("slurm.pl",
             ["JOB=1:1", str(log),
              "sh", "-c", "echo hit >> %s" % side],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert side.read_text().count("hit") == 1
    # and the header records the command literally
    assert "echo hit >>" in (tmp_path / "once.1.log").read_text()


def test_qsub_single_job_real_sge_task_id(tmp_path):
    """Real SGE sets SGE_TASK_ID to the literal 'undefined' for
    non-array jobs; the batch script must still resolve the task."""
    bindir = _install_fake(tmp_path, "qsub", FAKE_QSUB)
    log = tmp_path / "single_sge.log"
    r = _run("queue.pl", [str(log), "echo", "solo"], bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    text = log.read_text()
    assert "solo" in text and "status 0" in text


def test_qsub_l_option_with_name_eq_digits_value(tmp_path):
    """`-l gpu=1` is a standard Kaldi idiom whose value LOOKS like a
    JOB spec; known value-taking options must always consume their
    value."""
    bindir = _install_fake(tmp_path, "qsub", FAKE_QSUB)
    log = tmp_path / "lopt.JOB.log"
    r = _run("queue.pl",
             ["-l", "gpu=1", "JOB=1:2", str(log), "echo", "gpu", "JOB"],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    for i in (1, 2):
        assert ("gpu %d" % i) in \
            (tmp_path / ("lopt.%d.log" % i)).read_text()
    argv = (tmp_path / "sched_argv.log").read_text()
    assert "-l gpu=1" in argv
    assert "-t 1-2" in argv


def test_eq_form_options_route_through_mapping(tmp_path):
    bindir = _install_fake(tmp_path, "qsub", FAKE_QSUB)
    log = tmp_path / "eq.JOB.log"
    r = _run("queue.pl",
             ["--mem=4G", "--num-threads=3", "JOB=1:1", str(log),
              "echo", "eq", "JOB"],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    argv = (tmp_path / "sched_argv.log").read_text()
    assert "mem_free=4G,ram_free=4G" in argv
    assert "-pe smp 3" in argv
    assert "--mem" not in argv


def test_slurm_forwards_exclusive_and_requeue(tmp_path):
    bindir = _install_fake(tmp_path, "sbatch", FAKE_SBATCH)
    log = tmp_path / "excl.JOB.log"
    r = _run("slurm.pl",
             ["--exclusive", "--requeue", "JOB=1:1", str(log),
              "echo", "x", "JOB"],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    argv = (tmp_path / "sched_argv.log").read_text()
    assert "--exclusive" in argv and "--requeue" in argv


def test_large_array_uses_sidecar_dispatch(tmp_path):
    """Arrays above the case-branch cap switch to sidecar files so the
    submitted script stays O(1); substitution and logging still hold."""
    bindir = _install_fake(tmp_path, "sbatch", FAKE_SBATCH)
    log = tmp_path / "logs" / "big.JOB.log"
    r = _run("slurm.pl",
             ["JOB=1:200", str(log), "sh", "-c", 'echo "big JOB"'],
             bindir, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    for i in (1, 137, 200):
        text = (tmp_path / "logs" / ("big.%d.log" % i)).read_text()
        assert ("big %d" % i) in text and "status 0" in text
    script = (tmp_path / "logs" / "q" / "big.JOB.sh").read_text()
    assert "case" not in script
    assert (tmp_path / "logs" / "q" / "big.JOB.sh.cmds").exists()


def test_run_pl_consumes_name_eq_digits_option_values(tmp_path):
    """``run.pl -l mem_free=4096 JOB=1:2 log cmd``: the -l VALUE is
    name=digits shaped and must not be mistaken for the JOB spec (which
    would shift the real jobspec into the logfile position)."""
    log = tmp_path / "logs" / "opt.JOB.log"
    r = _run("run.pl",
             ["-l", "mem_free=4096", "-q", "all.q", "JOB=1:2",
              str(log), "echo", "task", "JOB"],
             str(tmp_path), tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    for i in (1, 2):
        text = (tmp_path / "logs" / ("opt.%d.log" % i)).read_text()
        assert ("task %d" % i) in text
    # and no stray file named after the jobspec was created
    assert not (tmp_path / "JOB=1:2").exists()


def test_run_pl_pe_option_takes_two_values(tmp_path):
    log = tmp_path / "pe.log"
    r = _run("run.pl",
             ["-pe", "smp", "4", str(log), "echo", "done"],
             str(tmp_path), tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "done" in log.read_text()


def test_run_pl_unknown_valueless_flag_before_jobspec(tmp_path):
    """An unknown valueless flag directly followed by the jobspec keeps
    the old heuristic: the jobspec must not be eaten as the flag's
    value."""
    log = tmp_path / "vf.JOB.log"
    r = _run("run.pl",
             ["-V", "JOB=1:2", str(log), "echo", "v", "JOB"],
             str(tmp_path), tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "v 2" in (tmp_path / "vf.2.log").read_text()
