"""Native (C++) host components vs their Python fallbacks."""

import numpy as np
import pytest

from heatx import native
from heatx.build import discretize as dz
from heatx.constants import MAX_RS
from heatx.model.building import BuildingModel, Construction, Material, Substance


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_parse_csv_matches_numpy(lib, ref_fixtures, tmp_path):
    path = f"{ref_fixtures}/massive_full/eplusout.csv"
    nat = native.parse_csv(path, list(range(1, 13)))
    ref = np.genfromtxt(path, delimiter=",", skip_header=1, usecols=range(1, 13))
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat, ref, rtol=0, atol=0)


def test_parse_csv_handles_garbage(lib, tmp_path):
    p = tmp_path / "weird.csv"
    p.write_text("h1,h2,h3\n1.5,abc,3\n,2,\n4,5,6\n")
    out = native.parse_csv(str(p), [0, 1, 2])
    assert out.shape == (3, 3)
    assert out[0, 0] == 1.5 and np.isnan(out[0, 1]) and out[0, 2] == 3.0
    assert np.isnan(out[1, 0]) and out[1, 1] == 2.0 and np.isnan(out[1, 2])
    np.testing.assert_array_equal(out[2], [4.0, 5.0, 6.0])


def _python_discretize(construction, model, model_dt, max_dx, min_dt):
    """Force the pure-Python search path by calling the fallback directly."""
    import math

    n = 1
    while True:
        dt = model_dt / n
        n_elements = []
        retry = False
        for mat_name in construction.materials:
            material = model.get_material(mat_name)
            substance = model.get_substance(material.substance)
            if substance.is_gas:
                n_elements.append(0)
                continue
            k, rho, cp = (
                substance.thermal_conductivity,
                substance.density,
                substance.specific_heat_capacity,
            )
            b = -dt / (rho * cp * MAX_RS)
            c = -2.0 * dt * k / (rho * cp)
            min_dx = (-b + math.sqrt(b * b - 4 * c)) / 2.0
            th = material.thickness
            if min_dx > th:
                if model_dt / (n + 1) > min_dt:
                    retry = True
                    break
                n_elements.append(0)
            else:
                m = math.floor(th / min_dx)
                dx = th / m
                if dx > max_dx:
                    if model_dt / (n + 1) > min_dt:
                        retry = True
                        break
                    n_elements.append(0)
                else:
                    n_elements.append(int(m))
        if not retry:
            return n, n_elements
        n += 1


@pytest.mark.parametrize(
    "layers,model_dt",
    [
        ([("c", 0.2)], 3600.0),
        ([("p", 0.02)], 3600.0),
        ([("p", 0.02), ("c", 0.2), ("p", 0.02)], 180.0),
        ([("c", 0.1), ("c", 0.05)], 900.0),
    ],
)
def test_discretize_native_matches_python(lib, layers, model_dt):
    m = BuildingModel()
    m.add_substance(Substance("c", thermal_conductivity=0.816, density=1700.0, specific_heat_capacity=800.0))
    m.add_substance(Substance("p", thermal_conductivity=0.0252, density=17.5, specific_heat_capacity=2400.0))
    mats = []
    for i, (sub, th) in enumerate(layers):
        m.add_material(Material(f"m{i}", sub, th))
        mats.append(f"m{i}")
    c = m.add_construction(Construction("x", mats))

    got = dz.discretize_construction(c, m, model_dt, 0.04, 60.0)
    exp = _python_discretize(c, m, model_dt, 0.04, 60.0)
    assert got == exp


def test_chunk_ids_native_matches_python(lib):
    rng = np.random.default_rng(3)
    S, N = 50, 9
    nomass = rng.random((S, N)) < 0.5
    n_nodes = rng.integers(1, N + 1, S).astype(np.int32)
    valid = np.arange(N)[None, :] < n_nodes[:, None]
    nomass &= valid

    cid, cnt, max_runs = native.chunk_ids(nomass, n_nodes, (N + 1) // 2)

    # python reference
    for s in range(S):
        cur = -1
        prev = False
        for i in range(N):
            if i < n_nodes[s] and nomass[s, i]:
                if not prev:
                    cur += 1
                assert cid[s, i] == cur
                prev = True
            else:
                assert cid[s, i] == -1
                prev = False
        for c in range(max_runs):
            assert cnt[s, c] == np.sum(cid[s] == c)


def test_parse_csv_overlong_line_falls_back(lib, tmp_path):
    """A CSV line exceeding the native 64 KiB read buffer returns None
    (numpy fallback) instead of silently splitting into misaligned rows."""
    p = tmp_path / "wide.csv"
    wide = ",".join(["1.0"] * 40000)  # ~240 KB line
    p.write_text(f"h\n{wide}\n")
    assert native.parse_csv(str(p), [0, 1]) is None
    # Ordinary files still parse natively.
    p2 = tmp_path / "ok.csv"
    p2.write_text("h1,h2\n1,2\n3,4")  # no trailing newline on the last row
    out = native.parse_csv(str(p2), [0, 1])
    np.testing.assert_array_equal(out, [[1.0, 2.0], [3.0, 4.0]])
