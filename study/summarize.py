"""Summarize Boussinesq_study/*.npz into an iteration-count table.

The reference study's de-facto benchmark is the saved
``[cd_linear_solves, ns_linear_solves, nonlinear_iters]`` triple per
configuration (reference study/Boussinesq_run.py:114-135); this prints a
markdown table of every saved run for BASELINE.md / reports.

Usage: python study/summarize.py [dir]
"""
import re
import sys
import glob
import os

import numpy as np


def main(d="Boussinesq_study"):
    rows = []
    for f in sorted(glob.glob(os.path.join(d, "*.npz"))):
        if f.endswith(".ckpt.npz"):  # mid-solve checkpoint, not a result
            continue
        name = os.path.basename(f)[:-4]
        m = re.match(r"Boussinesq(GS|NJ|JNK|PTC)_([0-9.e+~-]+)_(\d+)~(\d+)_",
                     name)
        if not m:
            continue
        mode, phys, P, Ne = m.group(1), m.group(2), m.group(3), m.group(4)
        Re, Ra, Pr = phys.split("~")
        with np.load(f) as z:
            arrs = [z[k] for k in z.files]
        iters = next(a for a in arrs if a.ndim == 1 and a.size in (3, 4))
        u_e = arrs[1]
        if float(Ra) > 1.1e4:
            # the domain u-max exceeds the centerline u-max at high Ra
            # (the peak moves off x=L/2) — report the literature-comparable
            # centerline anchor instead (de Vahl Davis / Le Quere tables)
            from centerline import centerline_anchors
            u_anchor, _ = centerline_anchors(u_e, arrs[2], int(P), int(Ne),
                                             Re=float(Re), Pr=float(Pr))
        else:
            u_anchor = float(np.abs(u_e).max()) * float(Re) * float(Pr)
        rows.append((mode, float(Re), float(Ra), int(P), int(Ne),
                     [int(x) for x in iters], round(u_anchor, 4)))
    rows.sort(key=lambda r: (r[1], r[2], r[3], r[4], r[0]))
    print("| mode | Re | Ra | P | Ne | [cd, ns, nonlinear] | u_max·Re·Pr |")
    print("|---|---|---|---|---|---|---|")
    for mode, Re, Ra, P, Ne, iters, ua in rows:
        print(f"| {mode} | {Re:.0e} | {Ra:.0e} | {P} | {Ne} | {iters} "
              f"| {ua} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
