#!/usr/bin/env bash
# Accuracy evaluation — equivalent of the reference's data/get_SER_*.sh +
# get_F1_*.sh harness: build VCFs from inferred haplotypes via
# cactus-pangenome, then score switch-error rate (whatshap compare) and
# SV F1 (truvari bench).
#
# External tools: cactus-pangenome, whatshap, truvari, bcftools, seqkit.
set -euo pipefail

SAMPLE=${1:?usage: eval_ser_f1.sh sample ref.fa truth.vcf.gz out_dir}
REF=${2:?}
TRUTH=${3:?}
OUT=${4:?}

cd "$OUT"
# 1) VCF from the inferred pair of haplotypes against the reference
cactus-pangenome ./js ./seqfile.txt --outDir cactus --outName "$SAMPLE" \
    --reference REF --vcf 2> cactus.log || {
    echo "cactus-pangenome failed; see $OUT/cactus.log" >&2; exit 1; }
VCF=cactus/${SAMPLE}.vcf.gz

# 2) switch error rate
whatshap compare --names truth,test --tsv-pairwise ser.tsv "$TRUTH" "$VCF"
awk -F'\t' 'NR==2 {print "SER:", $NF}' ser.tsv

# 3) SV F1 (indels >= 50bp)
bcftools norm -f "$REF" -m- "$VCF" -Oz -o test.norm.vcf.gz
bcftools index -t test.norm.vcf.gz
truvari bench -b "$TRUTH" -c test.norm.vcf.gz -o truvari --sizemin 50
python - <<'PY'
import json
with open("truvari/summary.json") as fh:
    s = json.load(fh)
print(f"SV precision={s['precision']:.4f} recall={s['recall']:.4f} f1={s['f1']:.4f}")
PY
