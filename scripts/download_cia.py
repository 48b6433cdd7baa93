"""Bulk-download HITRAN collision-induced absorption (.cia) files.

Equivalent of the reference's offline helper (ClearSky.jl
``scripts/download_cia.py``): fetches the standard HITRAN CIA set into a
target directory for use with ``clearsky_tpu.read_cia``. Requires network
access (run outside sandboxed environments).

Usage: python scripts/download_cia.py [outdir]
"""

import os
import sys
import urllib.request

BASE = "https://hitran.org/data/CIA/"

# the standard HITRAN CIA catalog (hitran.org/cia)
FILES = [
    "H2-H2_2011.cia",
    "H2-He_2011.cia",
    "H2-CH4_eq_2011.cia",
    "H2-H_2011.cia",
    "He-H_2011.cia",
    "N2-H2_2011.cia",
    "N2-He_2018.cia",
    "N2-N2_2018.cia",
    "N2-H2O_2018.cia",
    "N2-CH4_2011.cia",
    "O2-CO2_2011.cia",
    "O2-N2_2018.cia",
    "O2-O2_2018b.cia",
    "CO2-CO2_2018.cia",
    "CO2-H2_2018.cia",
    "CO2-He_2018.cia",
    "CO2-CH4_2018.cia",
    "CH4-He_2018.cia",
    "CH4-CH4_2018.cia",
]


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "cia"
    os.makedirs(outdir, exist_ok=True)
    for name in FILES:
        dest = os.path.join(outdir, name)
        if os.path.exists(dest):
            print(f"skip {name} (exists)")
            continue
        url = BASE + name
        print(f"downloading {url}")
        try:
            urllib.request.urlretrieve(url, dest)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"  FAILED: {e}")


if __name__ == "__main__":
    main()
