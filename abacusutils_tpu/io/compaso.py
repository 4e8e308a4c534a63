"""CompaSO halo catalog loader.

Capability-parity rebuild of the reference's
`abacusnbody.data.compaso_halo_catalog.CompaSOHaloCatalog`
(/root/reference/abacusnbody/data/compaso_halo_catalog.py:48-1430), with the
same constructor contract, field names, cleaning ("zipper") semantics, and
numerical outputs — but a different engine:

- field decompression is table-driven (FieldSpec list) instead of
  regex->lambda closures, with the same dependency-capture trick;
- the per-halo subsample "zipper" (original + cleaned particles interleaved
  per halo) is a vectorized ragged gather (`_ragged_gather`) instead of a
  sequential Numba loop;
- tables are :class:`abacusutils_tpu.io.table.Table`.

The loaded halo/particle arrays are flat, contiguous numpy — ready to be
shipped to TPU HBM by the HOD/analysis layers.
"""

import re
import warnings
from pathlib import Path, PurePath

import numpy as np

from ..utils.cumsum import cumsum
from . import bitpacked
from .asdf_file import open_asdf
from .table import Table

__all__ = ['CompaSOHaloCatalog']

INT16SCALE = 32000.0

# euler16 eigenvector compression constants (Abacus HaloStat format)
EULER_ABIN = 45
EULER_TBIN = 11
EULER_NORM = 1.8477590650225735122  # 1/sqrt(1-1/sqrt(2))


def unpack_euler16(packed):
    """Decode euler16-compressed orthonormal eigenvector triples.

    Returns (minor, middle, major), each (N,3) float64. Format
    (reference compaso_halo_catalog.py:1445-1550): the 16-bit code is
    az-bin + 45*(t-r bin + 121*cap), cap in 0..11 selecting an axis
    permutation/sign of the major axis, and the minor axis reconstructed from
    an azimuth bin under orthogonality.
    """
    packed = np.asarray(packed)
    N = len(packed)

    rest, iaz = np.divmod(packed, EULER_ABIN)
    cap, tr = np.divmod(rest, EULER_TBIN * EULER_TBIN)
    it = np.floor(np.sqrt(tr)).astype(int)
    ir = tr - it * it

    t = (it + 0.5) / EULER_TBIN
    r = (ir + 0.5) / (it + 0.5) - 1.0

    t = t / EULER_NORM
    t = t * np.sqrt(2.0 - t * t) / (1.0 - t * t)  # back to yy/zz

    yy = t
    xx = r * t
    norm = 1.0 / np.sqrt(1.0 + xx * xx + yy * yy)
    zz = norm
    yy = yy * norm
    xx = xx * norm

    major = np.zeros((N, 3))
    # cap encodes which axis carries zz and the signs/order of the others;
    # 12 caps = 3 axes x 4 sign/order variants
    sgn = np.where((cap % 4) % 2 == 0, 1.0, -1.0)
    swap = (cap % 4) >= 2  # whether xx/yy are swapped
    a = np.where(swap, xx, sgn * yy)
    b = np.where(swap, sgn * yy, xx)
    axis = cap // 4  # 0: zz on x; 1: zz on y; 2: zz on z
    for ax in range(3):
        m = axis == ax
        major[m, ax] = zz[m]
        major[m, (ax + 1) % 3] = a[m]
        major[m, (ax + 2) % 3] = b[m]

    az = (iaz + 0.5) * (np.pi / EULER_ABIN)
    cx = np.cos(az)
    cy = np.sin(az)

    minor = np.zeros((N, 3))
    # the two free minor components live in the plane not containing the
    # major axis' dominant coordinate; the third follows from orthogonality
    for ax, (i, j, k) in zip(range(3), [(1, 2, 0), (2, 0, 1), (0, 1, 2)]):
        m = axis == ax
        minor[m, i] = cx[m]
        minor[m, j] = cy[m]
        minor[m, k] = (minor[m, i] * major[m, i] + minor[m, j] * major[m, j]) / (
            -major[m, k]
        )
    minor /= np.linalg.norm(minor, axis=1)[:, None]

    middle = np.cross(minor, major)
    middle /= np.linalg.norm(middle, axis=1)[:, None]
    return minor, middle, major


# ---------------------------------------------------------------------------
# dtype tables — data contracts fixed by the AbacusSummit data model
# (reference compaso_halo_catalog.py:1624-1764)
# ---------------------------------------------------------------------------

clean_dt = np.dtype(
    [
        ('npstartA_merge', np.int64),
        ('npstartB_merge', np.int64),
        ('npoutA_merge', np.uint32),
        ('npoutB_merge', np.uint32),
        ('N_total', np.uint32),
        ('N_merge', np.uint32),
        ('haloindex', np.uint64),
        ('is_merged_to', np.int64),
        ('haloindex_mainprog', np.int64),
        ('v_L2com_mainprog', np.float32, 3),
    ],
    align=True,
)

clean_dt_progen = np.dtype(
    [
        ('npstartA_merge', np.int64),
        ('npstartB_merge', np.int64),
        ('npoutA_merge', np.uint32),
        ('npoutB_merge', np.uint32),
        ('N_total', np.uint32),
        ('N_merge', np.uint32),
        ('haloindex', np.uint64),
        ('is_merged_to', np.int64),
        ('N_mainprog', np.uint32),
        ('vcirc_max_L2com_mainprog', np.float32),
        ('sigmav3d_L2com_mainprog', np.float32),
        ('haloindex_mainprog', np.int64),
        ('v_L2com_mainprog', np.float32, 3),
    ],
    align=True,
)

halo_lc_dt = np.dtype(
    [
        ('N', np.uint32),
        ('N_interp', np.uint32),
        ('npstartA', np.uint64),
        ('npoutA', np.uint32),
        ('index_halo', np.int64),
        ('origin', np.int8),
        ('pos_avg', np.float32, 3),
        ('pos_interp', np.float32, 3),
        ('vel_avg', np.float32, 3),
        ('vel_interp', np.float32, 3),
        ('redshift_interp', np.float32),
    ],
    align=True,
)


def _vec3(names):
    return [(n, np.float32, 3) for n in names]


user_dt = np.dtype(
    [
        ('id', np.uint64),
        ('npstartA', np.uint64),
        ('npstartB', np.uint64),
        ('npoutA', np.uint32),
        ('npoutB', np.uint32),
        ('ntaggedA', np.uint32),
        ('ntaggedB', np.uint32),
        ('N', np.uint32),
        ('L2_N', np.uint32, 5),
        ('L0_N', np.uint32),
    ]
    + [
        f
        for com in ('_com', '_L2com')
        for f in (
            [(f'x{com}', np.float32, 3), (f'v{com}', np.float32, 3)]
            + [
                (f'{n}{com}', np.float32)
                for n in (
                    'sigmav3d',
                    'meanSpeed',
                    'sigmav3d_r50',
                    'meanSpeed_r50',
                    'r100',
                    'vcirc_max',
                )
            ]
            + [
                (
                    f'SO{"_L2max" if com == "_L2com" else ""}_central_particle',
                    np.float32,
                    3,
                ),
                (f'SO{"_L2max" if com == "_L2com" else ""}_central_density', np.float32),
                (f'SO{"_L2max" if com == "_L2com" else ""}_radius', np.float32),
            ]
        )
    ]
    + [
        f
        for com in ('_com', '_L2com')
        for f in (
            [(f'sigmav{w}{com}', np.float32) for w in ('Min', 'Mid', 'Maj')]
            + [
                (f'r{p}{com}', np.float32)
                for p in (10, 25, 33, 50, 67, 75, 90, 95, 98)
            ]
            + [(f'sigmar{com}', np.float32, 3), (f'sigman{com}', np.float32, 3)]
            + _vec3(
                [
                    f'sigma{rnv}_eigenvecs{w}{com}'
                    for rnv in 'rvn'
                    for w in ('Min', 'Mid', 'Maj')
                ]
            )
            + [
                (f'sigmavrad{com}', np.float32),
                (f'sigmavtan{com}', np.float32),
                (f'rvcirc_max{com}', np.float32),
            ]
        )
    ],
    align=True,
)

# order correction: reference lists eigvecs r, v, n grouped differently; ensure
# names exist — order of user_dt fields only affects 'DEFAULT_FIELDS' listing
# order, not values.


# ---------------------------------------------------------------------------
# field loaders: declarative specs, regex-dispatched like the reference
# (compaso_halo_catalog.py:798-937) so every documented field decompresses
# ---------------------------------------------------------------------------


class _DepCapture:
    """Records column accesses so we can compute raw-file dependencies."""

    def __init__(self):
        self.keys = []
        self.colnames = []

    def __getitem__(self, key):
        self.keys.append(key)
        return np.ones(1)


def _build_loaders(convert_units, header, passthrough=False):
    """Return ordered list of (compiled_regex, loader(match, raw, halos))."""
    if passthrough:
        return [(re.compile(r'.*'), lambda m, raw, halos: raw[m[0]])]

    if convert_units:
        box = header['BoxSize']
        zspace_to_kms = header['VelZSpace_to_kms']
    else:
        box = 1.0
        zspace_to_kms = 1.0

    L = []

    # int16 radius ratios scaled by r100
    L.append(
        (
            re.compile(r'(?:r\d{1,2}|rvcirc_max)(?P<com>_(?:L2)?com)'),
            lambda m, raw, halos: raw[m[0] + '_i16']
            * raw['r100' + m['com']]
            / INT16SCALE
            * box,
        )
    )

    def _sigmav_loader(m, raw, halos):
        stem = m['stem'].replace('Maj', 'Max')
        return (
            raw[stem + '_to_sigmav3d' + m['com'] + '_i16']
            * raw['sigmav3d' + m['com']]
            / INT16SCALE
            * zspace_to_kms
        )

    L.append(
        (re.compile(r'(?P<stem>sigmav(?:Min|Maj|rad|tan))(?P<com>_(?:L2)?com)'), _sigmav_loader)
    )

    L.append(
        (
            re.compile(r'sigmavMid(?P<com>_(?:L2)?com)'),
            lambda m, raw, halos: np.sqrt(
                halos['sigmav3d' + m['com']] ** 2
                - halos['sigmavMaj' + m['com']] ** 2
                - halos['sigmavMin' + m['com']] ** 2
            ),
        )
    )

    L.append(
        (
            re.compile(r'sigmar(?P<com>_(?:L2)?com)'),
            lambda m, raw, halos: raw[m[0] + '_i16']
            * np.reshape(raw['r100' + m['com']], (-1, 1))
            / INT16SCALE
            * box,
        )
    )

    L.append(
        (
            re.compile(r'sigman(?P<com>_(?:L2)?com)'),
            lambda m, raw, halos: raw[m[0] + '_i16'] / INT16SCALE,
        )
    )

    L.append(
        (
            re.compile(r'(x|r100)(?P<com>_(?:L2)?com)'),
            lambda m, raw, halos: raw[m[0]] * box,
        )
    )

    L.append(
        (
            re.compile(
                r'(v|sigmav3d|meanSpeed|sigmav3d_r50|meanSpeed_r50|vcirc_max)(?P<com>_(?:L2)?com)'
            ),
            lambda m, raw, halos: raw[m[0]] * zspace_to_kms,
        )
    )

    L.append(
        (
            re.compile(
                r'id|npstartA|npstartB|npoutA|npoutB|ntaggedA|ntaggedB|N|L2_N|L0_N'
                r'|N_total|N_merge|npstartA_merge|npstartB_merge|npoutA_merge'
                r'|npoutB_merge|npoutA_L0L1|npoutB_L0L1|is_merged_to|N_mainprog'
                r'|vcirc_max_L2com_mainprog|sigmav3d_L2com_mainprog|haloindex'
                r'|haloindex_mainprog|v_L2com_mainprog'
            ),
            lambda m, raw, halos: raw[m[0]],
        )
    )

    L.append(
        (
            re.compile(r'SO(?:_L2max)?(?:_central_particle|_radius)'),
            lambda m, raw, halos: raw[m[0]] * box,
        )
    )

    L.append(
        (
            re.compile(r'SO(?:_L2max)?(?:_central_density)'),
            lambda m, raw, halos: raw[m[0]],
        )
    )

    # halo light cone fields
    L.append(
        (
            re.compile(r'index_halo|pos_avg|vel_avg|redshift_interp|N_interp'),
            lambda m, raw, halos: raw[m[0]],
        )
    )
    L.append((re.compile(r'origin'), lambda m, raw, halos: raw[m[0]] % 3))

    def lc_interp_loader(m, raw, halos):
        cols = {}
        pa = np.atleast_2d(raw['pos_avg'])
        avg_avail = np.any(pa, axis=1)
        if m[0] == 'pos_interp' or 'pos_interp' in halos.colnames:
            cols['pos_interp'] = np.where(
                avg_avail[:, None], raw['pos_avg'], raw['pos_interp']
            )
        if m[0] == 'vel_interp' or 'vel_interp' in halos.colnames:
            cols['vel_interp'] = np.where(
                avg_avail[:, None], raw['vel_avg'], raw['vel_interp']
            )
        return cols

    L.append((re.compile(r'(?P<pv>pos|vel)_interp'), lc_interp_loader))

    def eigvecs_loader(m, raw, halos):
        minor, middle, major = unpack_euler16(raw[m['rnv'] + m['com'] + '_u16'])
        cols = {}
        for which, vec in zip(('Min', 'Mid', 'Maj'), (minor, middle, major)):
            name = m['rnv'] + which + m['com']
            if name in halos.colnames:
                cols[name] = vec
        return cols

    L.append(
        (
            re.compile(
                r'(?P<rnv>sigma(?:r|n|v)_eigenvecs)(?P<which>Min|Mid|Maj)(?P<com>_(?:L2)?com)'
            ),
            eigvecs_loader,
        )
    )

    return L


def _ragged_gather(starts, lens):
    """Index array selecting, for each segment i, elements
    starts[i]..starts[i]+lens[i] — the vectorized replacement for the
    reference's per-halo read loops."""
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    seg_start = np.cumsum(lens) - lens
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_start, lens)
    return np.repeat(starts, lens) + within


class CompaSOHaloCatalog:
    """A halo catalog from Abacus's on-the-fly group finder.

    Same constructor contract as the reference
    (compaso_halo_catalog.py:56-308): `path`, `cleaned`, `subsamples`,
    `convert_units`, `unpack_bits`, `fields`, `verbose`, `cleandir`,
    `filter_func`, `halo_lc`, `passthrough`.
    """

    def __init__(
        self,
        path,
        cleaned=True,
        subsamples=False,
        convert_units=True,
        unpack_bits=False,
        fields='DEFAULT_FIELDS',
        verbose=False,
        cleandir=None,
        filter_func=None,
        halo_lc=None,
        passthrough=False,
        **kwargs,
    ):
        load_subsamples = subsamples
        del subsamples

        self.cleaned = cleaned

        if halo_lc is None:
            halo_lc = self._is_path_halo_lc(
                path[0] if not isinstance(path, (PurePath, str)) else path
            )
            if verbose and halo_lc:
                print('Detected halo light cone catalog.')
        self.halo_lc = halo_lc

        if halo_lc:
            if not self.cleaned:
                warnings.warn(
                    '`cleaned=False` was specified but halo light cones always '
                    'incorporate cleaning'
                )
            cleaned = False
            unpack_bits = False
            self.cleaned = True

        if kwargs:
            raise ValueError(
                f'Unknown arguments to CompaSOHaloCatalog constructor: {list(kwargs)}'
            )

        (
            self.groupdir,
            self.clean_halo_info_dir,
            self.clean_rvpid_dir,
            self.superslab_inds,
            self.halo_fns,
            self.cleaned_halo_fns,
        ) = self._setup_file_paths(path, cleaned=cleaned, cleandir=cleandir, halo_lc=halo_lc)

        self.load_AB, self.load_pidrv = self._setup_load_subsamples(
            load_subsamples, passthrough=passthrough
        )
        del load_subsamples

        if halo_lc and self.load_AB:
            self.load_AB = ['A']

        self.data_key = 'data'
        self.convert_units = convert_units
        self.verbose = verbose
        self.filter_func = filter_func

        unpack_bits = self._setup_unpack_bits(unpack_bits)

        with open_asdf(self.halo_fns[0], lazy_load=True) as af:
            self.header = dict(af['header'])
            self.header['cleaned_halos'] = self.cleaned

        if cleaned:
            with open_asdf(self.cleaned_halo_fns[0], lazy_load=True) as af:
                self.header['TimeSliceRedshiftsPrev'] = af['header'][
                    'TimeSliceRedshiftsPrev'
                ]
                self.header['NumTimeSliceRedshiftsPrev'] = len(
                    af['header']['TimeSliceRedshiftsPrev']
                )

        self._loaders = _build_loaders(convert_units, self.header, passthrough=passthrough)

        N_halo_per_file = self._read_halo_info(
            self.halo_fns,
            fields,
            cleaned=cleaned,
            passthrough=passthrough,
            cleaned_fns=self.cleaned_halo_fns,
        )

        self.subsamples = Table()

        if halo_lc:
            self._load_halo_lc_subsamples(which=self.load_pidrv, unpack_bits=unpack_bits)
        elif self.load_AB:
            npstartAB_new = self._compute_new_subsample_indices(
                cleaned=cleaned, load_AB=self.load_AB
            )
            self._load_subsamples(
                N_halo_per_file,
                npstartAB_new,
                which=self.load_pidrv,
                load_AB=self.load_AB,
                cleaned=cleaned,
                unpack_bits=unpack_bits,
            )
            self._update_subsample_index_cols(
                npstartAB_new, load_AB=self.load_AB, cleaned=cleaned
            )

        if cleaned and not passthrough:
            self.halos.rename_column('N_total', 'N')

        if verbose:
            print('\n' + str(self))

    # ------------------------------------------------------------------
    @staticmethod
    def _is_path_halo_lc(path):
        path = Path(path)
        return 'halo_light_cones' in str(path) or any(path.glob('lc_*.asdf'))

    def _setup_file_paths(self, path, cleaned=True, cleandir=None, halo_lc=False):
        """Resolve halo_info files + cleaning-file layout
        (reference compaso_halo_catalog.py:310-417)."""
        if isinstance(path, (PurePath, str)):
            path = [Path(path)]
        else:
            path = [Path(p) for p in path]
            for p in path:
                if p.exists() and not p.is_file():
                    raise ValueError(
                        f'If passing a list of paths, all paths must be files, '
                        f'not dirs. Path "{p}" is not a file.'
                    )

        for p in path:
            if not p.exists():
                raise FileNotFoundError(f'Path "{p}" does not exist!')

        path = [p.absolute() for p in path]

        for i, p in enumerate(path):
            if p.name == 'halo_info':
                path[i] = p.parent

        if path[0].is_file():
            groupdir = path[0].parents[1]
            if halo_lc:
                groupdir = path[0].parent
            for p in path:
                if not groupdir == p.parents[1] and not halo_lc:
                    raise ValueError("Can't mix files from different catalogs!")
            halo_fns = path
            for i, p in enumerate(path):
                for j, q in enumerate(path[i + 1 :]):
                    if p == q:
                        raise ValueError(
                            f'Cannot pass duplicate halo_info files! Found '
                            f'duplicate "{p}" at indices {i} and {i + j + 1}'
                        )
        else:
            groupdir = path[0]
            globpat = 'lc_halo_info*.asdf' if halo_lc else 'halo_info/halo_info_*.asdf'
            halo_fns = sorted(groupdir.glob(globpat))
            if len(halo_fns) == 0:
                raise FileNotFoundError(
                    f'No halo_info files found! Search pattern was: '
                    f'"{groupdir / globpat}"'
                )

        if halo_lc:
            superslab_inds = np.array([0])
        else:
            superslab_inds = np.array([int(Path(fn).stem.split('_')[-1]) for fn in halo_fns])

        if cleaned:
            if not cleandir:
                for p in groupdir.parents:
                    if (cleandir := (p / 'cleaning')).is_dir():
                        break
                else:
                    raise FileNotFoundError(
                        f'Could not find cleaning info dir, searching upwards '
                        f'from {groupdir}. To load the uncleaned catalog, use '
                        f'`cleaned=False`.'
                    )
            cleandir = Path(cleandir)
            relpath = (groupdir.parents[1] / groupdir.name).relative_to(cleandir.parent)
            if (cleandir / relpath / 'cleaned_halo_info').is_dir():
                clean_halo_info_dir = cleandir / relpath / 'cleaned_halo_info'
                clean_rvpid_dir = cleandir / relpath / 'cleaned_rvpid'
            else:
                clean_halo_info_dir = cleandir / relpath
                clean_rvpid_dir = cleandir / relpath

            cleaned_halo_fns = [
                clean_halo_info_dir / f'cleaned_halo_info_{i:03d}.asdf'
                for i in superslab_inds
            ]
            for fn in cleaned_halo_fns:
                if not fn.is_file():
                    raise FileNotFoundError(
                        f'Cleaning info not found. File path was: "{fn}". To load '
                        f'the uncleaned catalog, use `cleaned=False`.'
                    )
        else:
            clean_halo_info_dir = None
            clean_rvpid_dir = None
            cleaned_halo_fns = []

        return (
            groupdir,
            clean_halo_info_dir,
            clean_rvpid_dir,
            superslab_inds,
            halo_fns,
            cleaned_halo_fns,
        )

    def _setup_unpack_bits(self, unpack_bits):
        if isinstance(unpack_bits, str):
            unpack_bits = [unpack_bits]
        if unpack_bits not in (True, False):
            try:
                for _f in unpack_bits:
                    assert _f in bitpacked.PID_FIELDS
            except Exception:
                raise ValueError(
                    f'`unpack_bits` must be True, False, or one of: '
                    f'"{bitpacked.PID_FIELDS}"'
                )
        return unpack_bits

    def _setup_load_subsamples(self, load_subsamples, passthrough=False):
        """Parse the `subsamples` argument into (load_AB, load_pidrv)
        (reference compaso_halo_catalog.py:433-512)."""
        if load_subsamples is False:
            return [], []

        if load_subsamples is True:
            if passthrough:
                load_subsamples = dict(A=True, B=True, rvint=True, packedpid=True)
            else:
                load_subsamples = dict(A=True, B=True, rv=True, pid=True)

        load_AB = []
        load_pidrv = []
        if isinstance(load_subsamples, dict):
            load_subsamples = dict(load_subsamples)
            load_AB = [k for k in 'AB' if load_subsamples.get(k)]

            if 'rv' in load_subsamples:
                if 'pos' in load_subsamples or 'vel' in load_subsamples:
                    raise ValueError(
                        'Cannot pass `rv` and `pos` or `vel` in `load_subsamples`.'
                    )

            load_pidrv = [
                k
                for k in load_subsamples
                if k in ('pid', 'pos', 'vel', 'rv', 'rvint', 'packedpid')
                and load_subsamples.get(k)
            ]

            if load_pidrv and not load_AB:
                warnings.warn(
                    f'Loading of {load_pidrv} was requested but neither subsample '
                    f'A nor B was specified. Assuming subsample A.'
                )
                load_AB = ['A']
            elif not load_pidrv and load_AB:
                if load_subsamples.get('pos') is not False:
                    load_pidrv += ['pos']
                if load_subsamples.get('vel') is not False:
                    load_pidrv += ['vel']
                if not load_pidrv:
                    warnings.warn(
                        f'Loading of subsample {load_AB} was requested but none '
                        f'of `pos`, `vel`, `rv`, `pid` was specified. Assuming `rv`.'
                    )
                    load_pidrv = ['rv']

            if load_subsamples.pop('field', False):
                raise ValueError(
                    'Loading field particles through CompaSOHaloCatalog is not '
                    'supported. Use abacusutils_tpu.io.read_abacus.read_asdf().'
                )

            for k in ('A', 'B', 'rv', 'pid', 'pos', 'vel', 'unpack', 'rvint', 'packedpid'):
                load_subsamples.pop(k, None)
            if load_subsamples:
                raise ValueError(
                    f'Unrecognized keys in `load_subsamples`: {list(load_subsamples)}'
                )

        if 'rv' in load_pidrv:
            load_pidrv.remove('rv')
            load_pidrv += ['pos', 'vel']

        return load_AB, load_pidrv

    # ------------------------------------------------------------------
    def _setup_fields(
        self,
        fields,
        cleaned=True,
        load_AB=None,
        halo_lc=False,
        passthrough=False,
        halo_info_af=None,
        cleaned_halo_info_af=None,
    ):
        """Determine the halo fields to load
        (reference compaso_halo_catalog.py:514-599)."""
        if passthrough:
            raw_fields = list(halo_info_af[self.data_key])
            raw_cleaned_fields = (
                list(cleaned_halo_info_af[self.data_key]) if cleaned_halo_info_af else []
            )
            if fields == 'all':
                return raw_fields, raw_cleaned_fields
            if isinstance(fields, str):
                fields = [fields]
            return (
                [r for r in raw_fields if r in fields],
                [r for r in raw_cleaned_fields if r in fields],
            )

        if fields == 'DEFAULT_FIELDS':
            fields = list(user_dt.names)
            if cleaned:
                fields += list(clean_dt.names)
            if halo_lc:
                fields += list(halo_lc_dt.names)
        if fields == 'all':
            fields = list(user_dt.names)
            if cleaned:
                fields += list(clean_dt_progen.names)
            if halo_lc:
                fields += list(halo_lc_dt.names)

        if isinstance(fields, str):
            fields = [fields]
        fields = list(fields)

        if cleaned:
            if 'N' in fields:
                fields.remove('N')
            if 'N_total' not in fields:
                fields += ['N_total']

        cleaned_fields = []
        if cleaned:
            for item in list(clean_dt_progen.names):
                if item in fields:
                    fields.remove(item)
                    cleaned_fields += [item]

        if halo_lc:
            for item in list(fields):
                if 'L2' not in item and item not in halo_lc_dt.names:
                    fields.remove(item)

        if load_AB is None:
            load_AB = []

        if cleaned:
            for AB in load_AB:
                if 'npstart' + AB not in fields:
                    fields += ['npstart' + AB]
                if 'npout' + AB not in fields:
                    fields += ['npout' + AB]
                if 'npstart' + AB + '_merge' not in cleaned_fields:
                    cleaned_fields += ['npstart' + AB + '_merge']
                if 'npout' + AB + '_merge' not in cleaned_fields:
                    cleaned_fields += ['npout' + AB + '_merge']

        return fields, cleaned_fields

    def _match_loader(self, field):
        match = None
        loader = None
        for pat, fn in self._loaders:
            m = pat.fullmatch(field)
            if m:
                if match is not None:
                    raise KeyError(f'Found more than one way to load field "{field}"')
                match, loader = m, fn
        if match is None:
            raise KeyError(f'Don\'t know how to load halo field "{field}"')
        return match, loader

    def _get_halo_fields_dependencies(self, fields):
        """Dependency capture: run each loader against recording proxies
        (reference compaso_halo_catalog.py:939-994)."""
        iter_fields = list(fields)
        raw_dependencies = []
        field_dependencies = []
        for field in iter_fields:
            match, loader = self._match_loader(field)
            capturer, raw_capturer = _DepCapture(), _DepCapture()
            loader(match, raw_capturer, capturer)
            raw_dependencies += raw_capturer.keys
            for k in capturer.keys:
                iter_fields += [k]
                if k not in fields:
                    field_dependencies += [k]

        raw_dependencies = list(set(raw_dependencies))
        # preserve order but use last occurrence (nested deps load first)
        fields_with_deps = list(dict.fromkeys(iter_fields[::-1]))
        field_deps = list(dict.fromkeys(field_dependencies[::-1]))
        return raw_dependencies, fields_with_deps, field_deps

    def _load_halo_field(self, halos, rawhalos, field):
        match, loader = self._match_loader(field)
        column = loader(match, rawhalos, halos)
        loaded = []
        if isinstance(column, dict):
            assert field in column
            for k, v in column.items():
                halos[k][:] = v
            loaded += list(column)
        else:
            halos[field][:] = column
            loaded += [field]
        return loaded

    def _read_halo_info(
        self, halo_fns, fields, cleaned=False, cleaned_fns=None, passthrough=False
    ):
        """Read + unpack all halo_info (and cleaned) files into self.halos
        (reference compaso_halo_catalog.py:601-796)."""
        if not cleaned_fns:
            cleaned_fns = []
        else:
            assert len(cleaned_fns) == len(halo_fns)

        afs = [open_asdf(fn, lazy_load=True) for fn in halo_fns]
        cleaned_afs = [open_asdf(fn, lazy_load=True) for fn in cleaned_fns]

        fields, cleaned_fields = self._setup_fields(
            fields,
            cleaned=cleaned,
            load_AB=self.load_AB,
            halo_lc=self.halo_lc,
            passthrough=passthrough,
            halo_info_af=afs[0],
            cleaned_halo_info_af=cleaned_afs[0] if cleaned else None,
        )
        self.fields = fields
        self.cleaned_fields = cleaned_fields

        N_halo_per_file = np.array(
            [len(af[self.data_key][next(iter(af[self.data_key]))]) for af in afs]
        )
        for _N, caf in zip(N_halo_per_file, cleaned_afs):
            assert len(caf[self.data_key][next(iter(caf[self.data_key]))]) == _N
        N_halos = int(N_halo_per_file.sum())

        cols = {}
        if not passthrough:
            for col in fields:
                dt_src = halo_lc_dt if col in halo_lc_dt.names else user_dt
                cols[col] = np.empty(N_halos, dtype=dt_src[col])
            for col in cleaned_fields:
                cols[col] = np.empty(N_halos, dtype=clean_dt_progen[col])
        else:
            raw_cols = afs[0][self.data_key]
            for field in fields:
                col = raw_cols[field]
                cols[field] = np.empty((N_halos,) + tuple(col.shape[1:]), dtype=col.dtype)
            if cleaned_afs:
                raw_cols = cleaned_afs[0][self.data_key]
                for field in cleaned_fields:
                    col = raw_cols[field]
                    cols[field] = np.empty(
                        (N_halos,) + tuple(col.shape[1:]), dtype=col.dtype
                    )

        all_fields = list(cols)
        raw_dependencies, fields_with_deps, extra_fields = (
            self._get_halo_fields_dependencies(all_fields)
        )
        if passthrough:
            assert set(raw_dependencies) == set(fields_with_deps)
            assert len(extra_fields) == 0

        self.halos = Table(cols, copy=False)
        self.halos.meta.update(self.header)

        if not passthrough:
            # main-progenitor history fields have per-epoch vectors
            r = re.compile('.*mainprog')
            for f in filter(r.match, cleaned_fields):
                if f in ('v_L2com_mainprog', 'haloindex_mainprog'):
                    continue
                self.halos.columns[f] = np.empty(
                    N_halos,
                    dtype=(clean_dt_progen[f], self.header['NumTimeSliceRedshiftsPrev']),
                )

        N_written = 0
        for i, af in enumerate(afs):
            caf = cleaned_afs[i] if cleaned_afs else None

            rawhalos = {}
            for field in raw_dependencies:
                src = caf if field in clean_dt_progen.names else af
                rawhalos[field] = np.asarray(src[self.data_key][field])
            rawhalos = Table(rawhalos, copy=False)
            af.close()
            if caf:
                caf.close()

            n_this = len(rawhalos)
            # view into the destination region; loaders write in place
            halos = self.halos[N_written : N_written + n_this]
            for field in extra_fields:
                src = clean_dt_progen if field in clean_dt_progen.names else user_dt
                halos.add_column(
                    np.empty(n_this, dtype=src[field]), name=field, copy=False
                )

            loaded_fields = []
            for field in fields_with_deps:
                if field in loaded_fields:
                    continue
                loaded_fields += self._load_halo_field(halos, rawhalos, field)

            if self.filter_func:
                if self.cleaned and not passthrough:
                    halos.rename_column('N_total', 'N')
                mask = np.asarray(self.filter_func(halos))
                nmask = int(mask.sum())
                # compact the kept rows to the front of the region
                for col in all_fields:
                    dst = self.halos.columns[col]
                    dst[N_written : N_written + nmask] = dst[
                        N_written : N_written + n_this
                    ][mask]
                N_superslab = nmask
            else:
                N_superslab = n_this
            N_written += N_superslab
            N_halo_per_file[i] = N_superslab

        if N_written < N_halos:
            for col in all_fields:
                self.halos.columns[col] = self.halos.columns[col][:N_written]

        return N_halo_per_file

    # ------------------------------------------------------------------
    def _compute_new_subsample_indices(self, cleaned=True, load_AB=None):
        """New write offsets interleaving original+merged particles per halo
        (reference compaso_halo_catalog.py:1039-1072)."""
        offset = np.uint64(0)
        if cleaned:
            cleaned_mask = self.halos['N_total'] == 0

        npstartAB_new = {}
        for AB in load_AB:
            npoutAB = self.halos[f'npout{AB}']
            if cleaned:
                # merged-away halos keep their particles in the absorbing halo
                self.halos[f'npout{AB}'][cleaned_mask] = 0
                npoutAB = npoutAB + self.halos[f'npout{AB}_merge']

            npstartAB_new[AB] = np.empty(len(self.halos) + 1, dtype=np.uint64)
            offset = cumsum(
                npoutAB, npstartAB_new[AB], initial=True, final=True, offset=offset
            )
        return npstartAB_new

    def _load_subsamples(
        self,
        N_halo_per_file,
        npstartAB_new,
        which=('pos', 'vel', 'pid'),
        load_AB=None,
        cleaned=True,
        unpack_bits=False,
    ):
        """Read rv/pid subsample files and zipper original+cleaned particles
        per halo into contiguous output (reference
        compaso_halo_catalog.py:1074-1346, vectorized)."""
        N_subsamp = int(
            npstartAB_new['B'][-1] if 'B' in load_AB else npstartAB_new['A'][-1]
        )
        for w in which:
            if w in ('pos', 'vel', 'rvint'):
                dtype = np.int32 if w == 'rvint' else np.float32
                self.subsamples.add_column(
                    np.empty((N_subsamp, 3), dtype=dtype), name=w, copy=False
                )

        if 'pid' in which or 'packedpid' in which:
            if unpack_bits is False:
                unpack_bits = 'packedpid' if 'packedpid' in which else 'pid'
            self.subsamples.update(
                bitpacked.empty_bitpacked_arrays(N_subsamp, unpack_bits), copy=False
            )

        which_files = []
        if any(w in which for w in ('pos', 'vel', 'rvint')):
            which_files += ['rv']
        if 'pid' in which or 'packedpid' in which:
            which_files += ['pid']

        halo_file_offsets = np.empty(len(N_halo_per_file) + 1, dtype=np.uint64)
        cumsum(N_halo_per_file, halo_file_offsets, initial=True, final=True)

        clean_afs = None
        if cleaned:
            clean_afs = [
                open_asdf(
                    self.clean_rvpid_dir / f'cleaned_rvpid_{i:03d}.asdf', lazy_load=True
                )
                for i in self.superslab_inds
            ]

        boxsize = self.header['BoxSize']
        ppd = self.header['ppd']

        for rvpid in which_files:
            colname = {'rv': 'rvint', 'pid': 'packedpid'}[rvpid]
            for AB in load_AB:
                for i in range(len(self.superslab_inds)):
                    fn = (
                        Path(self.groupdir)
                        / f'halo_{rvpid}_{AB}'
                        / f'halo_{rvpid}_{AB}_{self.superslab_inds[i]:03d}.asdf'
                    )
                    with open_asdf(fn, lazy_load=True) as af:
                        slab_particles = np.asarray(af[self.data_key][colname])

                    lo = int(halo_file_offsets[i])
                    hi = int(halo_file_offsets[i + 1])
                    rd_starts = self.halos[f'npstart{AB}'][lo:hi]
                    rd_lens = self.halos[f'npout{AB}'][lo:hi]
                    w_all = npstartAB_new[AB][lo : hi + 1].astype(np.int64)
                    w_starts = w_all[:-1]

                    # original particles write at each halo's new start
                    read_idx = _ragged_gather(rd_starts, rd_lens)
                    write_idx = _ragged_gather(w_starts, rd_lens)

                    segments = [(read_idx, write_idx, slab_particles)]

                    if cleaned:
                        cl = clean_afs[i]
                        clean_particles = np.asarray(
                            cl[self.data_key][f'{colname}_{AB}']
                        )
                        c_starts = self.halos[f'npstart{AB}_merge'][lo:hi]
                        c_lens = self.halos[f'npout{AB}_merge'][lo:hi]
                        # merged-away halos have npout set to 0 but merge
                        # columns may hold stale values; their write region is
                        # zero-length anyway because npout+merge was summed
                        # only for surviving halos
                        c_read = _ragged_gather(c_starts, c_lens)
                        c_write = _ragged_gather(
                            w_starts + rd_lens.astype(np.int64), c_lens
                        )
                        segments.append((c_read, c_write, clean_particles))

                    for ridx, widx, particles in segments:
                        if not len(ridx):
                            continue
                        src = particles[ridx]
                        if rvpid == 'rv':
                            if 'rvint' in self.subsamples:
                                self.subsamples['rvint'][widx] = src
                            pos = self.subsamples.columns.get('pos')
                            vel = self.subsamples.columns.get('vel')
                            if pos is not None or vel is not None:
                                p, v = bitpacked.unpack_rvint(
                                    src,
                                    boxsize,
                                    posout=None if pos is not None else False,
                                    velout=None if vel is not None else False,
                                )
                                if pos is not None:
                                    pos[widx] = p
                                if vel is not None:
                                    vel[widx] = v
                        else:
                            out = {
                                k: self.subsamples.columns[k]
                                for k in bitpacked.PID_FIELDS
                                if k in self.subsamples
                            }
                            res = bitpacked.unpack_pids(
                                src,
                                box=boxsize,
                                ppd=ppd,
                                **{
                                    k: True
                                    for k in out
                                    if k != 'packedpid'
                                },
                            )
                            for k, v in res.items():
                                out[k][widx] = v
                            if 'packedpid' in out:
                                out['packedpid'][widx] = src

        if clean_afs:
            for af in clean_afs:
                af.close()

    def _update_subsample_index_cols(self, npstartAB_new, load_AB='AB', cleaned=True):
        """Swap in the new interleaved indices
        (reference compaso_halo_catalog.py:1348-1371)."""
        for AB in load_AB:
            self.halos.remove_column(f'npstart{AB}')
            self.halos.remove_column(f'npout{AB}')
            if cleaned:
                self.halos.remove_column(f'npstart{AB}_merge')
                self.halos.remove_column(f'npout{AB}_merge')
            self.halos.add_column(
                npstartAB_new[AB][:-1], name=f'npstart{AB}', copy=False
            )
            self.halos.add_column(
                np.diff(npstartAB_new[AB]).astype(np.uint32), name=f'npout{AB}', copy=False
            )

    def _load_halo_lc_subsamples(self, which=('pos', 'vel', 'pid'), unpack_bits=False):
        """Light-cone subsamples: single file, subsample A only
        (reference compaso_halo_catalog.py:1373-1392)."""
        fn = Path(self.groupdir) / 'lc_pid_rv.asdf'
        with open_asdf(fn, lazy_load=True) as af:
            for w in which:
                self.subsamples.add_column(
                    np.asarray(af[self.data_key][w]), name=w, copy=False
                )
        if 'pid' in which and unpack_bits:
            self.subsamples.update(
                bitpacked.unpack_pids(
                    self.subsamples['pid'],
                    box=self.header['BoxSize'],
                    ppd=self.header['ppd'],
                    **{f: True for f in unpack_bits},
                ),
                copy=False,
            )

    # ------------------------------------------------------------------
    def nbytes(self, halos=True, subsamples=True):
        nbytes = 0
        which = ([self.halos] if halos else []) + ([self.subsamples] if subsamples else [])
        for cat in which:
            for col in cat.columns:
                nbytes += cat[col].nbytes
        return nbytes

    def __repr__(self):
        lines = [
            'CompaSO Halo Catalog',
            '====================',
            f'{self.header["SimName"]} @ z={self.header["Redshift"]:.5g}',
        ]
        lines += [
            '-' * len(lines[-1]),
            f'     Halos: {len(self.halos):8.3g} halos, {len(self.halos.columns):3d} fields',
            f'Subsamples: {len(self.subsamples):8.3g} particles, {len(self.subsamples.columns):3d} fields',
            f'Cleaned halos: {self.cleaned}',
            f'Halo light cone: {self.halo_lc}',
        ]
        return '\n'.join(lines)
