#!/usr/bin/env python3
"""emcee sampling of HOD parameters against clustering data
(counterpart of reference scripts/hod/run_emcee.py). Requires `emcee`
(optional dependency; not bundled in every environment)."""

import argparse
import os

import numpy as np
import yaml

from abacusutils_tpu.models.hod import AbacusHOD
from likelihood import Data

DEFAULTS = {'path2config': 'config/abacus_hod.yaml'}


def lnprob(p, param_mapping, param_tracer, Data, Ball):
    # read the parameters
    for key in param_mapping.keys():
        mapping_idx = param_mapping[key]
        tracer_type = param_tracer[key]
        Ball.tracers[tracer_type][key] = p[mapping_idx]

    # pass them to the mock generator
    mock_dict = Ball.run_hod(Ball.tracers, Ball.want_rsd, write_to_disk=False)
    clustering = Ball.compute_clustering(
        mock_dict, Ball.rpbins, Ball.pimax, Ball.pi_bin_size
    )
    return Data.compute_likelihood(clustering)


def main(path2config):
    try:
        import emcee
    except ImportError as e:
        raise SystemExit('emcee is not installed in this environment') from e

    config = yaml.safe_load(open(path2config))
    sim_params = config['sim_params']
    HOD_params = config['HOD_params']
    clustering_params = config['clustering_params']
    data_params = config['data_params']
    fit_params = config['fit_params']
    ch_config_params = config['ch_config_params']

    newData = Data(data_params, HOD_params)
    newBall = AbacusHOD(sim_params, HOD_params, clustering_params)

    nparams = len(fit_params.keys())
    param_mapping = {}
    param_tracer = {}
    params = np.zeros((nparams, 4))
    for key in fit_params.keys():
        mapping_idx = fit_params[key][0]
        tracer_type = fit_params[key][-1]
        param_mapping[key] = mapping_idx
        param_tracer[key] = tracer_type
        params[mapping_idx, :] = fit_params[key][1:-1]

    nwalkers = nparams * ch_config_params['walkersRatio']
    nsteps = ch_config_params['sampleIterations']

    p0 = params[:, 0] + params[:, 3] * np.random.normal(size=(nwalkers, nparams))
    sampler = emcee.EnsembleSampler(
        nwalkers, nparams, lnprob,
        args=(param_mapping, param_tracer, newData, newBall),
    )
    os.makedirs(ch_config_params['path2output'], exist_ok=True)
    sampler.run_mcmc(p0, nsteps, progress=True)
    np.save(
        os.path.join(ch_config_params['path2output'],
                     ch_config_params['chainsPrefix'] + '_chain.npy'),
        sampler.get_chain(),
    )


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--path2config', default=DEFAULTS['path2config'])
    main(**vars(parser.parse_args()))
