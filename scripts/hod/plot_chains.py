#!/usr/bin/env python3
"""Plot emcee chains (counterpart of reference scripts/hod/plot_chains.py).
Requires matplotlib."""

import argparse
import os

import numpy as np
import yaml


def main(path2config):
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    config = yaml.safe_load(open(path2config))
    ch = config['ch_config_params']
    chain = np.load(os.path.join(ch['path2output'], ch['chainsPrefix'] + '_chain.npy'))
    nsteps, nwalkers, nparams = chain.shape
    names = sorted(config['fit_params'], key=lambda k: config['fit_params'][k][0])

    fig, axes = plt.subplots(nparams, 1, figsize=(8, 2 * nparams), sharex=True)
    axes = np.atleast_1d(axes)
    for i, ax in enumerate(axes):
        ax.plot(chain[:, :, i], alpha=0.3, lw=0.5)
        ax.set_ylabel(names[i])
    axes[-1].set_xlabel('step')
    out = os.path.join(ch['path2output'], ch['chainsPrefix'] + '_chains.png')
    fig.savefig(out, dpi=120, bbox_inches='tight')
    print('saved', out)


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--path2config', default='config/abacus_hod.yaml')
    main(**vars(parser.parse_args()))
