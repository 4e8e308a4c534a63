"""Data-layer tests: catalog loading, subsample zipper, bit decoders, readers.

Golden files and the Mini_N64_L32 fixture live in the reference test tree
(read-only); the comparison contract matches the reference suite
(tests/test_data.py): exact ints, allclose floats.
"""

import numpy as np
import numpy.testing as npt
import pytest
from common import assert_close, assert_tables_close

from abacusutils_tpu.io import open_asdf
from abacusutils_tpu.io.compaso import CompaSOHaloCatalog
from abacusutils_tpu.io.read_abacus import read_asdf


def golden(refdir, name, key='data'):
    return open_asdf(refdir / name)[key]


def test_halos_unclean(example_sim, refdir):
    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000', subsamples=True, fields='all', cleaned=False
    )
    ref = golden(refdir, 'test_halos_unclean.asdf')
    assert_tables_close(ref, cat.halos)


def test_halos_clean(example_sim, refdir):
    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000', subsamples=True, fields='all', cleaned=True
    )
    ref = golden(refdir, 'test_halos_clean.asdf')
    halos = cat.halos
    assert_tables_close(ref, halos)

    npt.assert_equal(
        (halos['haloindex'] / 1e12).astype(int), cat.header['FullStepNumber']
    )
    refN = np.asarray(ref['N'])
    assert np.all(halos['is_merged_to'][refN == 0] != -1)
    npt.assert_equal(halos['N_merge'][refN == 0], 0)


def test_subsamples_unclean(example_sim, refdir):
    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000',
        subsamples=dict(A=True),
        fields='all',
        cleaned=False,
    )
    lenA = len(cat.subsamples)
    assert lenA == 2536
    assert cat.subsamples.colnames == ['pos', 'vel']

    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000',
        subsamples=dict(B=True),
        fields='all',
        cleaned=False,
    )
    lenB = len(cat.subsamples)
    assert lenB == 6128

    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000', subsamples=True, fields='all', cleaned=False
    )
    assert len(cat.subsamples) == lenA + lenB

    ref = golden(refdir, 'test_subsamples_unclean.asdf')
    ref_halos = golden(refdir, 'test_halos_unclean.asdf')

    ss = cat.subsamples
    for AB in 'AB':
        rs = np.asarray(ref_halos[f'npstart{AB}'])
        rl = np.asarray(ref_halos[f'npout{AB}'])
        cs = cat.halos[f'npstart{AB}']
        cl = cat.halos[f'npout{AB}']
        npt.assert_array_equal(rl, cl)
        for col in ref.colnames:
            rcol = np.asarray(ref[col])
            ccol = np.asarray(ss[col])
            for i in range(len(cat.halos)):
                assert_close(
                    rcol[rs[i] : rs[i] + rl[i]], ccol[cs[i] : cs[i] + cl[i]]
                )


def test_subsamples_clean(example_sim, refdir):
    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000', subsamples=True, fields='all', cleaned=True
    )
    ref = golden(refdir, 'test_subsamples_clean.asdf')
    assert_tables_close(ref, cat.subsamples)
    assert len(ref[ref.colnames[0]]) == np.sum(cat.halos['npoutA']) + np.sum(
        cat.halos['npoutB']
    )


def test_field_subset_loading(example_sim):
    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000', fields=['N', 'x_com']
    )
    assert set(cat.halos.colnames) == {'N', 'x_com'}


def test_one_halo_info(example_sim):
    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000' / 'halo_info' / 'halo_info_000.asdf',
        subsamples=True,
    )
    assert len(cat.halos) == 127
    assert len(cat.subsamples) == 3209


def test_halo_info_list(example_sim):
    cat = CompaSOHaloCatalog(
        [
            example_sim / 'halos' / 'z0.000' / 'halo_info' / 'halo_info_000.asdf',
            example_sim / 'halos' / 'z0.000' / 'halo_info' / 'halo_info_001.asdf',
        ],
        subsamples=True,
    )
    assert len(cat.halos) == 281
    assert len(cat.subsamples) == 6900

    with pytest.raises(ValueError):
        CompaSOHaloCatalog(
            [
                example_sim / 'halos' / 'z0.000' / 'halo_info' / 'halo_info_000.asdf',
                example_sim / 'halos' / 'z0.000' / 'halo_info' / 'halo_info_000.asdf',
            ]
        )


def test_unpack_bits(example_sim, refdir):
    from abacusutils_tpu.io.bitpacked import PID_FIELDS

    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000', subsamples=True, unpack_bits=True, fields='N'
    )
    assert set(PID_FIELDS) <= set(cat.subsamples.colnames)
    ref = golden(refdir, 'test_unpack_bits.asdf')
    assert_tables_close(ref, cat.subsamples)

    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000',
        subsamples=True,
        unpack_bits='density',
        fields='N',
    )
    assert 'density' in cat.subsamples.colnames
    assert 'lagr_pos' not in cat.subsamples.colnames

    with pytest.raises(ValueError):
        CompaSOHaloCatalog(
            example_sim / 'halos' / 'z0.000',
            subsamples=True,
            unpack_bits=['blah'],
            fields='N',
        )


def test_filter_func(example_sim):
    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000',
        fields=['N', 'x_L2com'],
        filter_func=lambda c: c['N'] > 100,
        subsamples=True,
    )
    assert (cat.halos['N'] > 100).all()
    assert len(cat.halos) == 146
    assert len(cat.subsamples) == 7193


def test_pack9(example_sim, refdir):
    fn = example_sim / 'slices' / 'z0.000' / 'L0_pack9' / 'slab000.L0.pack9.asdf'
    p = read_asdf(fn, load=('pos', 'vel'), dtype=np.float32, verbose=False)
    ref = golden(refdir, 'test_pack9.asdf')
    for k in ref.colnames:
        npt.assert_equal(np.asarray(p[k]), np.asarray(ref[k]))

    p = read_asdf(fn, dtype=np.float32, verbose=False)
    assert sorted(p.colnames) == ['pos', 'vel']

    pidfn = (
        example_sim / 'slices' / 'z0.000' / 'L0_pack9_pid' / 'slab000.L0.pack9.pid.asdf'
    )
    p = read_asdf(
        pidfn,
        load=('aux', 'pid', 'lagr_pos', 'tagged', 'density', 'lagr_idx'),
        verbose=False,
    )
    ref = golden(refdir, 'test_pack9_pid.asdf')
    for k in ref.colnames:
        npt.assert_equal(np.asarray(p[k]), np.asarray(ref[k]))

    p = read_asdf(pidfn, dtype=np.float32, verbose=False)
    assert p.colnames == ['pid']


def test_read_asdf(example_sim, refdir):
    halo_zdir = example_sim / 'halos' / 'z0.000'

    rv = read_asdf(
        halo_zdir / 'field_rv_A' / 'field_rv_A_000.asdf',
        load=('pos', 'vel'),
        dtype=np.float32,
        verbose=False,
    )
    pid = read_asdf(
        halo_zdir / 'field_pid_A' / 'field_pid_A_000.asdf',
        load=('aux', 'pid', 'lagr_pos', 'tagged', 'density', 'lagr_idx'),
        verbose=False,
    )
    af = open_asdf(refdir / 'test_read_asdf.asdf')
    for k in af['rv_data'].colnames:
        npt.assert_equal(np.asarray(rv[k]), np.asarray(af['rv_data'][k]))
    for k in af['pid_data'].colnames:
        npt.assert_equal(np.asarray(pid[k]), np.asarray(af['pid_data'][k]))


def test_halo_lc(testdata, refdir):
    cat = CompaSOHaloCatalog(
        testdata / 'halo_light_cones/AbacusSummit_base_c000_ph001-abridged/z2.250/',
        fields='all',
        subsamples=True,
    )
    assert cat.halo_lc is True
    assert_tables_close(golden(refdir, 'halo_lc_cat.asdf'), cat.halos)
    assert_tables_close(golden(refdir, 'halo_lc_subsample.asdf'), cat.subsamples)


def test_passthrough(example_sim):
    from abacusutils_tpu.io.bitpacked import unpack_pids, unpack_rvint

    cat = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000',
        subsamples=True,
        fields='all',
        cleaned=True,
        passthrough=True,
    )
    assert cat.subsamples.colnames == ['rvint', 'packedpid']
    assert cat.halos['npoutA'].sum() + cat.halos['npoutB'].sum() == len(cat.subsamples)

    pos, vel = unpack_rvint(cat.subsamples['rvint'], cat.header['BoxSize'])
    pid = unpack_pids(cat.subsamples['packedpid'], pid=True)['pid']

    regular = CompaSOHaloCatalog(
        example_sim / 'halos' / 'z0.000',
        subsamples=True,
        fields=[],
        cleaned=True,
        passthrough=False,
    )
    npt.assert_allclose(pos, regular.subsamples['pos'])
    npt.assert_allclose(vel, regular.subsamples['vel'])
    npt.assert_equal(pid, regular.subsamples['pid'])
    assert not np.all(cat.subsamples['packedpid'] == regular.subsamples['pid'])


@pytest.mark.parametrize(
    'layout_dir',
    [
        '1/Mini_N64_L32/halos/z0.000',
        '2/subsuite/Mini_N64_L32/halos/z0.000',
        '3/Mini_N64_L32/halos/z0.000',
        '4/Mini_N64_L32/halos/z0.000',
    ],
    ids=['1', '2', '3', '4'],
)
def test_cleaning_layouts(testdata, layout_dir):
    CompaSOHaloCatalog(
        testdata / 'cleaning_layouts' / layout_dir,
        subsamples=True,
        fields='N',
        cleaned=True,
    )


def test_native_compress_roundtrip():
    """Native C++ compressor output decodes identically through both the
    native and pure-Python decoders (formats interchangeable)."""
    import numpy as np

    from abacusutils_tpu.io.blosc import ChunkedBloscDecoder, decompress_chunk
    from abacusutils_tpu.io.native import compress_blosc_stream_native

    rng = np.random.default_rng(3)
    raw = np.cumsum(rng.normal(0, 1, 300_000)).astype(np.float32).tobytes()
    comp = compress_blosc_stream_native(raw, 4, clevel=1, nthreads=2)
    if comp is None:  # native lib unavailable in this environment
        import pytest

        pytest.skip('native IO library not built')
    out = np.empty(len(raw), np.uint8)
    ChunkedBloscDecoder(nthreads=2).decompress(comp, out)
    assert out.tobytes() == raw
    # pure-python chunk decoder on the native chunk
    import struct

    (size,) = struct.unpack_from('!I', comp, 0)
    chunk = comp[4 : 4 + size]
    nb = struct.unpack_from('<I', chunk, 4)[0]
    assert decompress_chunk(chunk).tobytes() == raw[:nb]


@pytest.mark.parametrize('compression', [None, 'blsc'])
def test_write_asdf_roundtrip(tmp_path, compression):
    """write_asdf round trip: nested tree, astropy-tagged Table (columns +
    meta), mixed dtypes, both uncompressed and blosc block compression."""
    from abacusutils_tpu.io import write_asdf
    from abacusutils_tpu.io.table import Table

    rng = np.random.default_rng(7)
    tab = Table(
        {
            'f32': rng.normal(size=1000).astype(np.float32),
            'f64': rng.normal(size=1000),
            'i64': rng.integers(-(2**40), 2**40, 1000),
            'u8': rng.integers(0, 255, 1000, dtype=np.uint8),
            'vec3': rng.normal(size=(1000, 3)).astype(np.float32),
        },
        meta={'SimName': 'Roundtrip_N0_L0', 'BoxSize': 123.5, 'n': 7},
    )
    tree = {
        'data': tab,
        'header': {'nested': {'arr': np.arange(11, dtype=np.uint32)}},
        'scalars': [1, 2.5, 'three'],
    }
    fn = tmp_path / 'rt.asdf'
    write_asdf(fn, tree, compression=compression)
    with open_asdf(fn) as af:
        got = af['data']
        assert isinstance(got, Table)
        assert got.colnames == tab.colnames
        for col in tab.colnames:
            arr = np.asarray(got[col])
            assert arr.dtype == tab[col].dtype
            npt.assert_array_equal(arr, tab[col])
        assert got.meta['SimName'] == 'Roundtrip_N0_L0'
        assert got.meta['BoxSize'] == 123.5
        assert got.meta['n'] == 7
        npt.assert_array_equal(
            np.asarray(af['header']['nested']['arr']), np.arange(11)
        )
        assert af['scalars'] == [1, 2.5, 'three']


def test_third_party_asdf_reads_blsc(tmp_path):
    """Third-party asdf must auto-register the blsc codec via the
    `asdf.extensions` entry point (pyproject) and read a write_asdf file.
    Skips when asdf isn't installed (reference pyproject.toml:44-45)."""
    asdf = pytest.importorskip('asdf')
    from abacusutils_tpu.io import write_asdf

    rng = np.random.default_rng(3)
    arr = rng.normal(size=4096).astype(np.float32)
    fn = tmp_path / 'ext.asdf'
    write_asdf(fn, {'data': {'x': arr}}, compression='blsc')
    with asdf.open(str(fn)) as af:
        npt.assert_array_equal(np.asarray(af['data']['x']), arr)


def test_subsamples_string_rejected(example_sim):
    # subsamples='A' (a plausible typo for dict(A=True)) must fail loudly,
    # not silently load zero particles (the reference dies with an
    # UnboundLocalError here; we raise a TypeError naming the valid forms)
    with pytest.raises(TypeError, match='subsamples'):
        CompaSOHaloCatalog(
            example_sim / 'halos' / 'z0.000', subsamples='A', fields=['N']
        )
