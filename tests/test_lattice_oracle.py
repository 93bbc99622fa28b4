"""lattice-oracle: minimum edit distance of any lattice path vs the
reference, checked against brute-force path enumeration + python
edit distance."""

import itertools

import numpy as np

from kaldi_lstm_tpu.io.lattice import Lattice, LatticeArc
from kaldi_lstm_tpu.tools.lattice_oracle import lattice_oracle


def _edit(a, b):
    m, n = len(a), len(b)
    d = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, n + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[n])


def _paths(lat):
    out = []

    def dfs(s, words):
        if s in lat.final:
            out.append(tuple(words))
        for a in lat.arcs[s]:
            dfs(a.dst, words + ([a.olabel] if a.olabel else []))

    dfs(lat.start, [])
    return out


def _random_lattice(rng, ns=10, nwords=4):
    lat = Lattice()
    for _ in range(ns):
        lat.add_state()
    for s in range(ns - 1):
        for _ in range(rng.randint(1, 3)):
            lat.arcs[s].append(LatticeArc(
                int(rng.randint(0, 3)), int(rng.randint(0, nwords + 1)),
                0.1, 0.1, int(rng.randint(s + 1, ns))))
    lat.final[ns - 1] = (0.0, 0.0)
    return lat


def test_oracle_matches_brute_force():
    rng = np.random.RandomState(0)
    for _ in range(20):
        lat = _random_lattice(rng)
        ref = [int(w) for w in rng.randint(1, 5, rng.randint(0, 5))]
        errs, oracle = lattice_oracle(lat, ref)
        want = min(_edit(list(p), ref) for p in _paths(lat))
        assert errs == want
        # the returned oracle path must achieve that distance and be a
        # real lattice path
        assert _edit(oracle, ref) == errs
        assert tuple(oracle) in _paths(lat)


def test_oracle_zero_when_ref_in_lattice():
    lat = Lattice()
    for _ in range(4):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 7, 0, 0, 1))
    lat.arcs[1].append(LatticeArc(1, 8, 0, 0, 2))
    lat.arcs[0].append(LatticeArc(1, 9, 0, 0, 3))
    lat.final[2] = (0.0, 0.0)
    lat.final[3] = (0.0, 0.0)
    assert lattice_oracle(lat, [7, 8]) == (0, [7, 8])
    assert lattice_oracle(lat, [9]) == (0, [9])
    errs, _ = lattice_oracle(lat, [7, 9])
    assert errs == 1


def test_oracle_cli(tmp_path):
    from kaldi_lstm_tpu.io.lattice import LatticeWriter
    from kaldi_lstm_tpu.tools.lattice_oracle import main
    lat = Lattice()
    for _ in range(3):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 2, 0, 0, 1))
    lat.arcs[1].append(LatticeArc(1, 3, 0, 0, 2))
    lat.final[2] = (0.0, 0.0)
    with LatticeWriter(f"ark:{tmp_path}/lat.ark") as w:
        w.write("u1", lat)
    (tmp_path / "text").write_text("u1 2 4\n")
    rc = main([f"ark:{tmp_path}/lat.ark", str(tmp_path / "text"),
               "--oracle-wspecifier", f"ark,t:{tmp_path}/oracle.txt"])
    assert rc == 0
    assert "2 3" in (tmp_path / "oracle.txt").read_text()
