"""Extract the HITRAN molparam/TIPS data table into a compact .npz.

The reference ships a generated data table (ClearSky.jl
``src/hitran/molparam.jl``, itself produced offline by
``scripts/molparam.py`` from public HITRAN molparam + TIPS data): per
molecule 1..55, the isotopologue IDs, Earth abundances, molar masses, Qref,
and Chebyshev fits of Q(T)/Qref on T in [25, 1000] K. This script parses that
*data* table (it is data, not code) and writes it as
``clearsky_tpu/spectra/molparam_data.npz`` for device-resident use.

Run once:  python scripts/gen_molparam.py [path-to-molparam.jl]

Regenerating from PRIMARY sources instead (preferred when network access
exists): fetch the per-isotopologue TIPS files ``hitran.org/data/Q/q<N>.txt``
and the molecule/isotopologue metadata tables (``docs/molec-meta``,
``docs/iso-meta``), fit Chebyshev polynomials to Qref/Q(T) on T in
[25, 1000] K to <= 5e-3 max relative error (adding terms until it holds,
as the reference's offline fit does), and write the same npz fields
(``iso_mol``, ``iso_abundance``, ``iso_mu``, ``iso_gi``, ``tips_coeffs``,
``iso_row``). This environment has no egress and ships no Q files, so the
extraction above is the only available path here; the fits themselves are
property-tested in tests/test_lineshapes.py::test_tips_chebyshev_sane
(Qref/Q(296 K) ~ 1, Q monotone in T) and tests/test_spectra.py (Qref
golden values).
"""

from __future__ import annotations

import re
import sys
import ast
from pathlib import Path

import numpy as np

DEFAULT_SRC = "/root/reference/src/hitran/molparam.jl"
OUT = Path(__file__).resolve().parent.parent / "clearsky_tpu" / "spectra" / "molparam_data.npz"


def _strip_comments(text: str) -> str:
    return re.sub(r"#[^\n]*", "", text)


def _split_top_level(s: str) -> list[str]:
    """Split a comma-separated argument string at bracket depth zero."""
    parts, depth, buf, in_str = [], 0, [], False
    for ch in s:
        if ch == '"':
            in_str = not in_str
        if not in_str:
            if ch in "[(":
                depth += 1
            elif ch in "])":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(buf).strip())
                buf = []
                continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def _parse_vec(s: str):
    """Parse a Julia typed vector literal like Float64[1.0, 2.0] or String["a"]."""
    s = s.strip()
    i = s.index("[")
    body = s[i:]
    # Vector{Float64}[ Float64[...], ... ] — nested
    if s.startswith("Vector"):
        inner = body[1:-1].strip()
        if not inner:
            return []
        return [_parse_vec(p) for p in _split_top_level(inner)]
    body = body.replace("true", "True").replace("false", "False")
    return list(ast.literal_eval(body.replace("[", "[", 1)))


def parse_molparam(path: str):
    text = Path(path).read_text()
    text = _strip_comments(text)
    # locate each MolParam( ... ) entry by bracket matching
    entries = []
    i = 0
    while True:
        j = text.find("MolParam(", i)
        if j < 0:
            break
        k = j + len("MolParam(")
        depth = 1
        while depth > 0:
            if text[k] == "(":
                depth += 1
            elif text[k] == ")":
                depth -= 1
            k += 1
        entries.append(text[j + len("MolParam(") : k - 1].strip())
        i = k
    mols = []
    for e in entries:
        if not e:  # MolParam() — unassigned molecule number
            mols.append(None)
            continue
        args = _split_top_level(e)
        assert len(args) == 13, f"expected 13 fields, got {len(args)}"
        mols.append(
            dict(
                M=int(args[0]),
                formula=ast.literal_eval(args[1]),
                name=ast.literal_eval(args[2]),
                iso_global=_parse_vec(args[3]),
                isoform=_parse_vec(args[4]),
                afgl=_parse_vec(args[5]),
                A=_parse_vec(args[6]),
                mu=_parse_vec(args[7]),
                Qref=_parse_vec(args[8]),
                hascheb=_parse_vec(args[9]),
                ncheb=_parse_vec(args[10]),
                maxrelerr=_parse_vec(args[11]),
                cheb=_parse_vec(args[12]),
            )
        )
    return mols


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    mols = parse_molparam(src)
    n_mol = len(mols)
    mol_formula = np.array([m["formula"] if m else "" for m in mols])
    mol_name = np.array([m["name"] if m else "" for m in mols])

    iso_mol, iso_local, iso_global, iso_afgl = [], [], [], []
    iso_A, iso_mu, iso_Qref, iso_hascheb, iso_maxrelerr = [], [], [], [], []
    chebs = []
    for m in mols:
        if m is None:
            continue
        for li in range(len(m["A"])):
            iso_mol.append(m["M"])
            iso_local.append(li + 1)
            iso_global.append(m["iso_global"][li])
            iso_afgl.append(m["afgl"][li])
            iso_A.append(m["A"][li])
            iso_mu.append(m["mu"][li])
            iso_Qref.append(m["Qref"][li])
            iso_hascheb.append(bool(m["hascheb"][li]))
            iso_maxrelerr.append(m["maxrelerr"][li])
            chebs.append(np.asarray(m["cheb"][li], dtype=np.float64))
    ncheb = np.array([len(c) for c in chebs], dtype=np.int32)
    maxn = int(ncheb.max())
    cheb_mat = np.zeros((len(chebs), maxn))
    for i, c in enumerate(chebs):
        cheb_mat[i, : len(c)] = c

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        OUT,
        n_mol=np.int32(n_mol),
        mol_formula=mol_formula,
        mol_name=mol_name,
        iso_mol=np.asarray(iso_mol, np.int32),
        iso_local=np.asarray(iso_local, np.int32),
        iso_global=np.asarray(iso_global, np.int32),
        iso_afgl=np.asarray(iso_afgl, np.int32),
        iso_A=np.asarray(iso_A, np.float64),
        iso_mu=np.asarray(iso_mu, np.float64),
        iso_Qref=np.asarray(iso_Qref, np.float64),
        iso_hascheb=np.asarray(iso_hascheb, bool),
        iso_ncheb=ncheb,
        iso_maxrelerr=np.asarray(iso_maxrelerr, np.float64),
        iso_cheb=cheb_mat,
    )
    print(f"wrote {OUT}: {n_mol} molecules, {len(chebs)} isotopologues, ncheb_max={maxn}")


if __name__ == "__main__":
    main()
