"""Pipe protocol test: pipe_asdf | C client vs golden output
(contract of reference tests/test_pipe_asdf.sh)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope='module')
def client(tmp_path_factory):
    src = REPO / 'native' / 'pipe_client'
    build = tmp_path_factory.mktemp('pipe_client')
    exe = build / 'client'
    subprocess.run(
        ['gcc', '-O2', '-o', str(exe), str(src / 'client.c')], check=True
    )
    return exe


def test_pipe_asdf(client, example_sim, refdir):
    fns = sorted((example_sim / 'halos' / 'z0.000' / 'halo_info').glob('*.asdf'))
    pipe = subprocess.Popen(
        [sys.executable, '-m', 'abacusutils_tpu.io.pipe_asdf']
        + [str(f) for f in fns]
        + ['-f', 'N', '-f', 'x_com'],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )
    out = subprocess.run(
        [str(client)], stdin=pipe.stdout, capture_output=True, check=True
    )
    pipe.wait()
    assert pipe.returncode == 0
    expected = (refdir / 'pipe.txt').read_bytes()
    assert out.stdout == expected
