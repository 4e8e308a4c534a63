#!/usr/bin/env python3
"""Generate light-cone HOD mock catalogs (counterpart of reference
scripts/hod/run_lc_hod.py)."""

import argparse

import yaml

from abacusutils_tpu.models.hod import AbacusHOD

DEFAULTS = {'path2config': 'config/abacus_lc_hod.yaml'}


def main(path2config):
    config = yaml.safe_load(open(path2config))
    ball = AbacusHOD(
        config['sim_params'], config['HOD_params'], config['clustering_params']
    )
    mock_dict = ball.run_hod(
        ball.tracers,
        config['HOD_params']['want_rsd'],
        write_to_disk=config['HOD_params'].get('write_to_disk', True),
    )
    for tr in mock_dict:
        print(tr, 'galaxies:', len(mock_dict[tr]['x']), 'Ncent:', mock_dict[tr]['Ncent'])


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--path2config', default=DEFAULTS['path2config'])
    main(**vars(parser.parse_args()))
