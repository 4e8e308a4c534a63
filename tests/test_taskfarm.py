"""Task farmer: taskfile parsing, dispatch, status/resume, shared claiming.

Native equivalent of the reference's vendored disBatch usage (reference
scripts/disBatch/Readme.md semantics; scripts/emulator/README.md workflow).
Pure host-side — no JAX.
"""

import os
import subprocess
import sys

from abacusutils_tpu.utils.taskfarm import (
    Barrier,
    Task,
    farm,
    load_status,
    parse_taskfile,
)


def test_parse_directives():
    lines = [
        '# a comment',
        '',
        'echo plain',
        '#FARM PREFIX ( ',
        '#FARM SUFFIX  ) > out.log',
        'echo wrapped',
        '#FARM PREFIX ',
        '#FARM SUFFIX ',
        '#FARM BARRIER',
        'echo after',
        '#FARM REPEAT 3 start 5 echo rep',
    ]
    entries = parse_taskfile(lines)
    assert entries[0] == Task(0, 'echo plain')
    assert entries[1] == Task(1, '( echo wrapped ) > out.log')
    assert isinstance(entries[2], Barrier)
    assert entries[3] == Task(3, 'echo after')
    reps = entries[4:]
    assert [t.repeat_index for t in reps] == [5, 6, 7]
    assert all(t.command == 'echo rep' for t in reps)
    # the disBatch spelling parses identically
    assert parse_taskfile(['#DISBATCH REPEAT 2 echo x'])[0].command == 'echo x'


def test_farm_runs_and_status(tmp_path):
    taskfile = tmp_path / 'tasks'
    outdir = tmp_path / 'out'
    outdir.mkdir()
    lines = [f'echo $TASKFARM_TASKID > {outdir}/t$TASKFARM_TASKID\n'
             for _ in range(5)]
    taskfile.write_text(''.join(lines))
    res = farm(str(taskfile), workers=3)
    assert res.ran == 5 and res.failed == 0
    for i in range(5):
        assert (outdir / f't{i}').read_text().strip() == str(i)
    done = load_status(str(taskfile) + '_status.txt')
    assert sorted(done) == list(range(5))
    assert all(rc == 0 for rc, _ in done.values())


def test_farm_failure_and_resume_retry(tmp_path):
    taskfile = tmp_path / 'tasks'
    marker = tmp_path / 'ran_twice'
    taskfile.write_text('true\n'
                        f'test -f {marker}\n'  # fails first run, ok second
                        'false\n')
    status1 = str(tmp_path / 's1')
    res1 = farm(str(taskfile), workers=2, status_path=status1)
    assert res1.failed == 2 and sorted(res1.failed_ids) == [1, 2]

    # resume without retry: everything skipped (failures stay failed)
    res2 = farm(str(taskfile), workers=2, resume_from=status1,
                status_path=str(tmp_path / 's2'))
    assert res2.ran == 0 and res2.skipped == 3

    # resume with retry: only the two failures re-run
    marker.write_text('')
    res3 = farm(str(taskfile), workers=2, resume_from=status1, retry=True,
                status_path=str(tmp_path / 's3'))
    assert res3.skipped == 1 and res3.ran == 2 and res3.failed == 1
    assert res3.failed_ids == [2]


def test_resume_detects_changed_command(tmp_path):
    taskfile = tmp_path / 'tasks'
    taskfile.write_text('true\n')
    status1 = str(tmp_path / 's1')
    farm(str(taskfile), workers=1, status_path=status1)
    taskfile.write_text('echo changed\n')
    res = farm(str(taskfile), workers=1, resume_from=status1,
               status_path=str(tmp_path / 's2'))
    assert res.ran == 1 and res.skipped == 0  # command text changed -> re-run
    res = farm(str(taskfile), workers=1, resume_from=status1,
               force_resume=True, status_path=str(tmp_path / 's3'))
    assert res.ran == 0 and res.skipped == 1  # id-only matching


def test_barrier_orders_execution(tmp_path):
    taskfile = tmp_path / 'tasks'
    seq = tmp_path / 'seq'
    pre = '\n'.join(f'echo pre >> {seq}' for _ in range(4))
    taskfile.write_text(f'{pre}\n#FARM BARRIER\necho post >> {seq}\n')
    res = farm(str(taskfile), workers=4)
    assert res.failed == 0
    assert seq.read_text().split() == ['pre'] * 4 + ['post']


def test_shared_claims_exactly_once(tmp_path):
    """Two farmer processes drain one taskfile; each task runs once."""
    taskfile = tmp_path / 'tasks'
    outfile = tmp_path / 'claimed'
    claims = tmp_path / 'claims'
    # flock-append is atomic per task; sleep widens the race window
    lines = [
        f'sleep 0.0$(($TASKFARM_TASKID % 3)); echo $TASKFARM_TASKID >> {outfile}\n'
        for _ in range(24)
    ]
    taskfile.write_text(''.join(lines))
    cmd = [sys.executable, '-m', 'abacusutils_tpu.utils.taskfarm',
           str(taskfile), '-w', '2', '--shared', str(claims)]
    env = dict(os.environ)
    procs = [
        subprocess.Popen(cmd + ['-s', str(tmp_path / f'status{i}')], env=env)
        for i in range(2)
    ]
    assert all(p.wait(timeout=120) == 0 for p in procs)
    ran = sorted(int(t) for t in outfile.read_text().split())
    assert ran == list(range(24))  # every task exactly once, no duplicates
    # and both farmers' status files together cover all 24
    done = {}
    for i in range(2):
        done.update(load_status(str(tmp_path / f'status{i}')))
    assert sorted(done) == list(range(24))


def test_cli_exit_code_and_logs(tmp_path):
    taskfile = tmp_path / 'tasks'
    taskfile.write_text('echo hello\nfalse\n')
    logdir = tmp_path / 'logs'
    rc = subprocess.call(
        [sys.executable, '-m', 'abacusutils_tpu.utils.taskfarm',
         str(taskfile), '-w', '1', '--log-dir', str(logdir)]
    )
    assert rc == 1  # a task failed
    assert (logdir / 'task_0.log').read_text().strip() == 'hello'


def test_resume_with_tab_in_command(tmp_path):
    # commands containing tabs must round-trip through the status file
    # (load_status splits on '\t' with maxsplit so field 7 keeps its tabs)
    taskfile = tmp_path / 'tasks'
    taskfile.write_text(f"printf 'a\\tb' > {tmp_path}/out\n")
    status = str(taskfile) + '_status.txt'
    res = farm(str(taskfile), workers=1)
    assert res.ran == 1 and res.failed == 0
    done = load_status(status)
    assert done[0][1].startswith('printf')
    res2 = farm(str(taskfile), workers=1, resume_from=status)
    assert res2.skipped == 1 and res2.ran == 0


def test_shared_release_stale(tmp_path):
    # a farmer that claimed a task but never recorded a status line
    # (crashed mid-task) leaves an orphaned claim; release_stale returns
    # the task to the pool, while finished claims stay honored
    taskfile = tmp_path / 'tasks'
    outdir = tmp_path / 'out'
    outdir.mkdir()
    taskfile.write_text(
        ''.join(f'touch {outdir}/t{i}\n' for i in range(3))
    )
    claims = tmp_path / 'claims'
    status = str(taskfile) + '_status.txt'
    res = farm(str(taskfile), workers=2, shared=str(claims))
    assert res.ran == 3
    # simulate a crashed farmer: claim task 99-like entry for task 1 of a
    # NEW taskfile generation by rewriting history — easiest faithful
    # simulation: append an extra claim with no status record
    with open(claims, 'a') as f:
        f.write('7\n')
    taskfile.write_text(
        ''.join(f'touch {outdir}/u{i}\n' for i in range(8))
    )
    # without release_stale, task 7 is permanently skipped
    res2 = farm(str(taskfile), workers=2, shared=str(claims),
                resume_from=status)
    assert not (outdir / 'u7').exists()
    # with release_stale (fleet stopped), the orphaned claim is dropped
    res3 = farm(str(taskfile), workers=2, shared=str(claims),
                resume_from=status, release_stale=True)
    assert (outdir / 'u7').exists()
    assert res3.failed == 0
