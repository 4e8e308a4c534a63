#!/usr/bin/env python3
"""Nested sampling of HOD parameters with dynesty (counterpart of reference
scripts/hod/run_nested.py). Requires `dynesty` (optional dependency)."""

import argparse
import os

import numpy as np
import yaml

from abacusutils_tpu.models.hod import AbacusHOD
from likelihood import Data

DEFAULTS = {'path2config': 'config/abacus_hod.yaml'}


def lnprob(p, param_mapping, param_tracer, Data, Ball):
    for key in param_mapping.keys():
        Ball.tracers[param_tracer[key]][key] = p[param_mapping[key]]
    mock_dict = Ball.run_hod(Ball.tracers, Ball.want_rsd, write_to_disk=False)
    clustering = Ball.compute_clustering(
        mock_dict, Ball.rpbins, Ball.pimax, Ball.pi_bin_size
    )
    return Data.compute_likelihood(clustering)


def main(path2config):
    try:
        import dynesty
    except ImportError as e:
        raise SystemExit('dynesty is not installed in this environment') from e

    config = yaml.safe_load(open(path2config))
    fit_params = config['fit_params']
    ch = config['ch_config_params']

    newData = Data(config['data_params'], config['HOD_params'])
    newBall = AbacusHOD(
        config['sim_params'], config['HOD_params'], config['clustering_params']
    )

    nparams = len(fit_params)
    param_mapping = {}
    param_tracer = {}
    bounds = np.zeros((nparams, 2))
    for key, spec in fit_params.items():
        idx, mean, lo, hi, std, tracer = spec
        param_mapping[key] = idx
        param_tracer[key] = tracer
        bounds[idx] = (lo, hi)

    def prior_transform(u):
        return bounds[:, 0] + u * (bounds[:, 1] - bounds[:, 0])

    sampler = dynesty.NestedSampler(
        lnprob, prior_transform, nparams,
        logl_args=(param_mapping, param_tracer, newData, newBall),
        nlive=ch.get('nlive', 500),
    )
    sampler.run_nested()
    os.makedirs(ch['path2output'], exist_ok=True)
    np.save(
        os.path.join(ch['path2output'], ch['chainsPrefix'] + '_results.npy'),
        sampler.results.samples,
    )


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--path2config', default=DEFAULTS['path2config'])
    main(**vars(parser.parse_args()))
