#!/usr/bin/env python3
"""VG diploid-sampling baseline wrapper.

Equivalent of the reference competitor pipeline
(/root/reference/data/vg_haplotypes.py): index a GBZ graph, sketch the
reads with KMC (k=29), run ``vg haplotypes --diploid-sampling`` to pick
two haplotypes, extract them as FASTA, and reverse-complement with
seqtk. External tools: vg, kmc, seqtk.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd: list[str], **kw) -> None:
    print("[vg_haplotypes] $", " ".join(cmd), file=sys.stderr, flush=True)
    subprocess.run(cmd, check=True, **kw)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-g", "--gbz", required=True, help="input GBZ graph")
    ap.add_argument("-r", "--reads", required=True, help="input FASTQ reads")
    ap.add_argument("-t", "--threads", type=int, default=16)
    ap.add_argument("-d", "--tmp-dir", required=True)
    ap.add_argument("-o", "--output", default="sample.fa")
    args = ap.parse_args()

    tmp = args.tmp_dir
    os.makedirs(tmp, exist_ok=True)
    t = str(args.threads)

    # distance + r-index over the GBZ
    run(["vg", "index", "-j", f"{tmp}/temp.dist", args.gbz])
    run(["vg", "gbwt", "-p", "--num-threads", t, "-r", f"{tmp}/temp.ri",
         "-Z", args.gbz])
    # haplotype information
    run(["vg", "haplotypes", "-v", "2", "-t", t, "-H", f"{tmp}/temp.hapl",
         args.gbz])
    # read sketch (KMC k=29, same parameters as the reference baseline)
    run(["kmc", "-k29", "-m128", "-okff", f"-t{t}", "-hp", args.reads,
         f"{tmp}/sample", tmp])
    # diploid sampling
    run(["vg", "haplotypes", "--diploid-sampling", "-v", "2", "-t", t,
         "--num-haplotypes", "2", "-i", f"{tmp}/temp.hapl",
         "-k", f"{tmp}/sample.kff", "-g", f"{tmp}/sample.gbz", args.gbz])
    # extract sampled paths
    with open(args.output, "w") as fh:
        run(["vg", "paths", "-x", f"{tmp}/sample.gbz", "-F",
             "-S", "recombination"], stdout=fh)
    # reverse complement in place
    rc = args.output + ".rc.tmp"
    with open(rc, "w") as fh:
        run(["seqtk", "seq", "-r", args.output], stdout=fh)
    shutil.move(rc, args.output)
    print(f"[vg_haplotypes] wrote {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
