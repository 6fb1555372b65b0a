#!/usr/bin/env bash
# VG diploid-sampling baseline batch runner — equivalent of the
# reference's data/run_vg_batch.sh: for each sample, build the GBZ (+
# dist/r-index) for its leave-one-out graph, then run the VG
# diploid-sampling pipeline (scripts/vg_haplotypes.py) per coverage.
#
# Layout (same as run_batch.sh):
#   $GRAPH_DIR/MHC_wo_${SAMPLE}.gfa      leave-one-out graph (plain GFA)
#   $READS_DIR/${SAMPLE}.${COV}.fq       read sets
#   $OUT_DIR/${SAMPLE}_${COV}/full.fa    sampled diploid FASTA
# External tools: vg, gfa2gbwt, kmc, seqtk.
set -euo pipefail

SAMPLES_FILE=${1:?usage: run_vg_batch.sh samples.txt graph_dir reads_dir out_dir [cov] [threads]}
GRAPH_DIR=${2:?}
READS_DIR=${3:?}
OUT_DIR=${4:?}
COV=${5:-2x}
THREADS=${6:-$(nproc)}
VG_HAP=${VG_HAP:-$(dirname "$0")/vg_haplotypes.py}
TMP_DIR=${TMP_DIR:-$OUT_DIR/tmp_vg}

mkdir -p "$OUT_DIR" "$TMP_DIR"
while read -r SAMPLE; do
    [ -z "$SAMPLE" ] && continue
    GFA="$GRAPH_DIR/MHC_wo_${SAMPLE}.gfa"
    [ -f "$GFA" ] || { echo "[run_vg_batch] missing $GFA" >&2; continue; }
    PREFIX="$GRAPH_DIR/MHC_wo_${SAMPLE}"
    XG="$PREFIX.xg"; GBWT="$PREFIX.gbwt"; GBZ="$PREFIX.gbz"

    if [ ! -f "$GBZ" ]; then
        echo "[run_vg_batch] $SAMPLE: GFA -> GBWT/XG -> GBZ"
        gfa2gbwt -b "$PREFIX" < "$GFA"
        vg convert -g "$GFA" -x > "$XG"
        vg gbwt -x "$XG" "$GBWT" --gbz-format -g "$GBZ"
    fi

    r="$READS_DIR/${SAMPLE}.${COV}.fq"
    [ -f "$r" ] || { echo "[run_vg_batch] missing reads $r" >&2; continue; }
    o="$OUT_DIR/${SAMPLE}_${COV}"
    mkdir -p "$o"
    echo "[run_vg_batch] $SAMPLE ($COV)"
    python3 "$VG_HAP" -g "$GBZ" -r "$r" -d "$TMP_DIR" -t "$THREADS" \
        -o "$o/full.fa" 2> "$o/log.txt"
done < "$SAMPLES_FILE"
