#!/usr/bin/env python3
"""calc_power throughput on synthetic particles (counterpart of reference
scripts/power/bench.py: M particles/sec on 1e7 random positions)."""

import argparse
import gc
import timeit

import numpy as np

from abacusutils_tpu.ops.power import calc_power


def main(n=int(1e7), nmesh=256, box=2000.0, nrep=4, dtype='f4'):
    rng = np.random.default_rng(123)
    pos = (rng.random((n, 3), dtype=np.float32) * box).astype(dtype)

    calc_power(pos, box, nmesh=nmesh, paste='TSC')  # compile
    gc.collect()

    t = timeit.timeit(
        lambda: calc_power(pos, box, nmesh=nmesh, paste='TSC'), number=nrep
    ) / nrep
    print(f'calc_power: {n / t / 1e6:.1f} M particles/s ({t:.3f} s per call, nmesh={nmesh})')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('-n', type=int, default=int(1e7))
    parser.add_argument('--nmesh', type=int, default=256)
    parser.add_argument('--box', type=float, default=2000.0)
    parser.add_argument('--nrep', type=int, default=4)
    main(**vars(parser.parse_args()))
