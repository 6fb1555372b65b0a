#!/usr/bin/env python3
"""VCF + reference FASTA → walk-bearing GFA, via `vg`/`gfa2gbwt`.

Equivalent of the reference's vcf2gfa.py front-end (reference:
/root/reference/vcf2gfa.py, README.md:36-38): enables the VCF input mode
(`vcf2gfa -v X.vcf.gz -r ref.fa | bgzip > G.gfa.gz`, then run the normal
diploid inference).

Pipeline (same external toolchain as the reference, reimplemented):
  1. rename the VCF/FASTA chromosome to a PanSN-style name (REF#0)
     so haplotype walks get stable sample names;
  2. vg construct (alt-paths, VCF phased) → .vg graph;
  3. vg gbwt: haplotype index from the VCF, path cover + combined index;
  4. vg gbwt → GBZ; gfa2gbwt emits a W-line GFA.

External tools required on PATH: vg, gfa2gbwt, bgzip, tabix.
"""

from __future__ import annotations

import argparse
import gzip
import os
import shutil
import subprocess
import sys
import tempfile


def _require(tool: str) -> None:
    if shutil.which(tool) is None:
        sys.exit(f"error: required external tool '{tool}' not found on PATH")


def _run(cmd: list[str], **kw) -> None:
    print(f"[vcf2gfa] $ {' '.join(cmd)}", file=sys.stderr)
    subprocess.run(cmd, check=True, **kw)


def rename_chrom(vcf_in: str, fa_in: str, vcf_out: str, fa_out: str,
                 name: str = "REF#0") -> None:
    """Rewrite CHROM/contig names to a single PanSN name."""
    opener = gzip.open if vcf_in.endswith(".gz") else open
    with opener(vcf_in, "rt") as fin, open(vcf_out, "w") as fout:
        for line in fin:
            if line.startswith("##contig"):
                import re

                line = re.sub(r"ID=[^,>]+", f"ID={name}", line)
            elif not line.startswith("#"):
                parts = line.split("\t")
                parts[0] = name
                line = "\t".join(parts)
            fout.write(line)
    opener = gzip.open if fa_in.endswith(".gz") else open
    with opener(fa_in, "rt") as fin, open(fa_out, "w") as fout:
        first = True
        for line in fin:
            if line.startswith(">"):
                if not first:
                    break  # single-contig mode, like the reference
                fout.write(f">{name}\n")
                first = False
            else:
                fout.write(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-v", "--vcf", required=True)
    ap.add_argument("-r", "--ref", required=True)
    ap.add_argument("-o", "--out", default="-", help="output GFA (default stdout)")
    ap.add_argument("--tmpdir", default=None)
    ap.add_argument("-p", "--paths-per-sample", type=int, default=30)
    args = ap.parse_args()

    for tool in ("vg", "gfa2gbwt", "bgzip", "tabix"):
        _require(tool)

    tmp = args.tmpdir or tempfile.mkdtemp(prefix="vcf2gfa_")
    os.makedirs(tmp, exist_ok=True)
    vcf = os.path.join(tmp, "renamed.vcf")
    fa = os.path.join(tmp, "renamed.fa")
    rename_chrom(args.vcf, args.ref, vcf, fa)
    _run(["bgzip", "-f", vcf])
    _run(["tabix", "-f", "-p", "vcf", vcf + ".gz"])

    vggraph = os.path.join(tmp, "graph.vg")
    with open(vggraph, "wb") as fh:
        _run(["vg", "construct", "-aS", "-r", fa, "-v", vcf + ".gz"], stdout=fh)
    gbwt = os.path.join(tmp, "haps.gbwt")
    _run(["vg", "gbwt", "-x", vggraph, "-v", vcf + ".gz", "-o", gbwt])
    cover = os.path.join(tmp, "cover.gbwt")
    _run(["vg", "gbwt", "-x", vggraph, "-P", "-o", cover, gbwt])
    combined = os.path.join(tmp, "combined.gbwt")
    _run(["vg", "gbwt", "-m", "-o", combined, gbwt, cover])
    gbz = os.path.join(tmp, "graph.gbz")
    _run(["vg", "gbwt", "-x", vggraph, "-g", gbz, "--gbz-format", combined])
    # gfa2gbwt emits <basename>.gfa next to the GBZ
    base = os.path.join(tmp, "graph")
    _run(["gfa2gbwt", "-d", base, "-p", "-m", str(args.paths_per_sample)])
    gfa = base + ".gfa"
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    with open(gfa) as fh:
        shutil.copyfileobj(fh, out)
    if out is not sys.stdout:
        out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
