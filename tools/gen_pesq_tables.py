"""Extract the ITU-T P.862 (PESQ) standard constant tables into a generated
Python module.

The tables (Bark band centres/widths, Hz-per-Bark bin counts, power-density
corrections, absolute hearing thresholds, input IIR filter sections) are
standards data published in the ITU-T P.862 reference implementation; this
script reads them out of the reference tree's MATLAB copy
(demand_voice_bank_objective_scoring/pesq.m) rather than hand-typing ~400
floats. Run once:

    python tools/gen_pesq_tables.py
"""

import re
import os

SRC = "/root/reference/demand_voice_bank_objective_scoring/pesq.m"
DST = os.path.join(os.path.dirname(__file__), "..", "deepxi_tpu", "metrics",
                   "_pesq_tables.py")

NAMES = [
    "Sp", "Sl", "Downsample", "Align_Nfft", "InIIR_Nsos",
    "InIIR_Hsos", "nr_of_hz_bands_per_bark_band", "centre_of_band_bark",
    "centre_of_band_hz", "width_of_band_bark", "width_of_band_hz",
    "pow_dens_correction_factor", "abs_thresh_power",
]


def extract(text: str, name: str):
    """Value of `name= ...;` -- scalar or bracketed (multiline) array."""
    m = re.search(rf"\b{re.escape(name)}\s*=\s*(\[[^\]]*\]|[-+0-9.eE]+)\s*;",
                  text, re.S)
    if not m:
        raise KeyError(name)
    val = m.group(1)
    if val.startswith("["):
        nums = re.findall(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?", val)
        return [float(x) for x in nums]
    return float(val)


def main():
    text = open(SRC).read()
    out = {}
    for rate in ("8k", "16k"):
        for name in NAMES:
            out[f"{name}_{rate}"] = extract(text, f"{name}_{rate}")
        out[f"Nb_{rate}"] = len(out[f"centre_of_band_bark_{rate}"])
    # wideband input filter (applies at 16k in P.862.2 mode)
    wb = re.search(r"case 16E3\s*WB_InIIR_Nsos = 1;\s*WB_InIIR_Hsos = \[([^\]]*)\]",
                   text)
    out["WB_InIIR_Hsos_16k"] = [float(x) for x in
                                re.findall(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?",
                                           wb.group(1))]

    with open(DST, "w") as f:
        f.write('"""ITU-T P.862 (PESQ) standard constant tables.\n\n'
                "Standards data from the ITU-T P.862 reference implementation\n"
                "(auto-extracted by tools/gen_pesq_tables.py; see that script).\n"
                '"""\n\n# fmt: off\n')
        for k, v in out.items():
            f.write(f"{k} = {v!r}\n")
        f.write("# fmt: on\n")
    print("wrote", DST, "with", len(out), "tables")
    for k, v in out.items():
        n = len(v) if isinstance(v, list) else "scalar"
        print(f"  {k}: {n}")


if __name__ == "__main__":
    main()
