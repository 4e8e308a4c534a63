#!/usr/bin/env python3
"""Generate HOD mock catalogs and time the run_hod + clustering loop
(counterpart of the reference scripts/hod/run_hod.py)."""

import argparse
import time

import numpy as np
import yaml

from abacusutils_tpu.models.hod import AbacusHOD

DEFAULTS = {'path2config': 'config/abacus_hod.yaml'}


def main(path2config, ntest=20):
    config = yaml.safe_load(open(path2config))
    sim_params = config['sim_params']
    HOD_params = config['HOD_params']
    clustering_params = config['clustering_params']

    want_rsd = HOD_params['want_rsd']
    write_to_disk = HOD_params.get('write_to_disk', False)
    bin_params = clustering_params['bin_params']
    rpbins = np.logspace(bin_params['logmin'], bin_params['logmax'], bin_params['nbins'] + 1)
    pimax = clustering_params['pimax']
    pi_bin_size = clustering_params['pi_bin_size']

    ball = AbacusHOD(sim_params, HOD_params, clustering_params)

    # warmup (jit compile) + optional write
    mock_dict = ball.run_hod(ball.tracers, want_rsd, write_to_disk=write_to_disk)
    start = time.time()
    ball.compute_xirppi(mock_dict, rpbins, pimax, pi_bin_size)
    print('Done xi, total time ', time.time() - start)

    meantime = 0.0
    for i in range(ntest):
        start = time.time()
        mock_dict = ball.run_hod(ball.tracers, want_rsd, write_to_disk=False)
        print(f'[{i}] run_hod took', time.time() - start)
        start = time.time()
        ball.compute_xirppi(mock_dict, rpbins, pimax, pi_bin_size)
        deltat = time.time() - start
        print(f'[{i}] xi took', deltat)
        meantime += deltat
    print('meantime ', meantime / ntest)


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--path2config', default=DEFAULTS['path2config'])
    parser.add_argument('--ntest', type=int, default=20)
    main(**vars(parser.parse_args()))
