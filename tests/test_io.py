"""CSV I/O contract tests (reference src/load.cc:3-97 semantics)."""

import numpy as np
import pytest

from icp_tpu.io.csv import load_matrix, write_matrix
from tests.conftest import data_path


def test_load_cow_shape():
    ref = load_matrix(data_path("cow_ref.txt"))
    assert ref.shape == (2903, 3)  # 2904 lines - 1 header
    assert ref.dtype == np.float64
    np.testing.assert_allclose(ref[0], [0.605538, 0.183122, -0.472278])


def test_load_ignores_extra_columns():
    # cow_tr2.txt has 5 columns (Points_Magnitude, Point ID) — first 3 only.
    tr2 = load_matrix(data_path("cow_tr2.txt"))
    assert tr2.shape == (2903, 3)
    np.testing.assert_allclose(tr2[0], [0.901687, 0.399705, -0.511128])


def test_load_missing_file_exits_2(tmp_path):
    with pytest.raises(SystemExit) as exc:
        load_matrix(str(tmp_path / "nope.txt"), use_native=False)
    assert exc.value.code == 2


def test_load_unparsable_fields_default_zero(tmp_path):
    # sscanf semantics: fields that fail to parse stay 0.0.
    f = tmp_path / "weird.txt"
    f.write_text("h1,h2,h3\n1.5,abc,2.5\n,,\n3.0\n")
    arr = load_matrix(str(f), use_native=False)
    np.testing.assert_allclose(arr, [[1.5, 0.0, 0.0], [0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])


def test_load_trailing_garbage_scanf_semantics(tmp_path):
    # sscanf("%lf,%lf,%lf"): the numeric prefix is converted and KEPT, then
    # the literal ',' fails to match the garbage character and the line stops
    # (remaining fields stay 0).  "1.5abc,2,3" -> [1.5, 0, 0].
    f = tmp_path / "garbage.txt"
    f.write_text("h1,h2,h3\n1.5abc,2,3\n1.5 ,2,3\n-2e1,0.5x,9\n7,8,9\n")
    expected = [[1.5, 0.0, 0.0], [1.5, 0.0, 0.0], [-20.0, 0.5, 0.0], [7.0, 8.0, 9.0]]
    arr = load_matrix(str(f), use_native=False)
    np.testing.assert_allclose(arr, expected)
    # native parser must agree field-for-field
    from icp_tpu.io import native

    if native.get_lib() is not None:
        nat = native.try_load(str(f))
        np.testing.assert_array_equal(nat, arr)


def test_write_roundtrip(tmp_path):
    pts = np.array([[0.605538, 0.183122, -0.472278], [1.0, -2.0, 3.0]])
    out = str(tmp_path / "out.txt")
    write_matrix(pts, out)
    lines = open(out).read().splitlines()
    assert lines[0] == "Points_0,Points_1,Points_2"
    assert lines[1] == "0.605538,0.183122,-0.472278"  # %g, 6 significant digits
    assert lines[2] == "1,-2,3"
    back = load_matrix(out, use_native=False)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_native_loader_matches_python():
    from icp_tpu.io import native

    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    a = native.try_load(data_path("cow_tr2.txt"))
    b = load_matrix(data_path("cow_tr2.txt"), use_native=False)
    np.testing.assert_array_equal(a, b)


def test_native_writer_matches_python(tmp_path):
    from icp_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    pts = np.array([[0.605538, 0.183122, -0.472278], [1.0, -2.0, 3.0]])
    py_out, nat_out = str(tmp_path / "py.txt"), str(tmp_path / "nat.txt")
    write_matrix(pts, py_out)
    assert native.try_write(pts, nat_out)
    assert open(py_out).read() == open(nat_out).read()


def test_load_hex_floats_strtod_parity(tmp_path):
    # C99 %lf / strtod accept hex floats; the exact Python parser must agree
    # with the native parser (0x1A -> 26.0, 0x1.8p1 -> 3.0; a bare "0x"
    # parses as 0 with the 'x' breaking the comma match — strtod behavior)
    f = tmp_path / "hex.txt"
    f.write_text("h1,h2,h3\n0x1A,2,3\n0x1.8p1,-0X10,4\n0x,5,6\n")
    expected = [[26.0, 2.0, 3.0], [3.0, -16.0, 4.0], [0.0, 0.0, 0.0]]
    arr = load_matrix(str(f), use_native=False)
    np.testing.assert_allclose(arr, expected)
    from icp_tpu.io import native

    if native.get_lib() is not None:
        nat = native.try_load(str(f))
        np.testing.assert_array_equal(nat, arr)


def test_load_matrices_batch_matches_single(tmp_path, rng):
    # threaded native multi-file loader == per-file loads, including the
    # odd-format cases the single-file suite pins (extra columns, garbage)
    from icp_tpu.io.csv import load_matrices, load_matrix

    paths = []
    for i in range(5):
        n = int(rng.integers(3, 200))
        pts = rng.standard_normal((n, 3))
        lines = ["Points_0,Points_1,Points_2"]
        for row in pts:
            lines.append(",".join(f"{x:.10g}" for x in row))
        p = tmp_path / f"cloud{i}.txt"
        p.write_text("\n".join(lines) + "\n")
        paths.append(str(p))
    # one file with extra columns + a garbage field
    (tmp_path / "odd.txt").write_text(
        "Points_0,Points_1,Points_2,Points_Magnitude\n"
        "1.5,2.5,3.5,99\n"
        "1.5abc,2,3\n"
        "4,5,6,0\n"
    )
    paths.append(str(tmp_path / "odd.txt"))

    batch = load_matrices(paths)
    singles = [load_matrix(p) for p in paths]
    assert len(batch) == len(singles)
    for b, s in zip(batch, singles):
        np.testing.assert_array_equal(b, s)


def test_load_matrices_falls_back_without_native(tmp_path):
    from icp_tpu.io.csv import load_matrices

    p = tmp_path / "a.txt"
    p.write_text("h\n1,2,3\n")
    out = load_matrices([str(p), str(p)], use_native=False)
    assert len(out) == 2
    np.testing.assert_array_equal(out[0], [[1.0, 2.0, 3.0]])
