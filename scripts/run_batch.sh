#!/usr/bin/env bash
# Leave-one-out HPRC batch runner — equivalent of the reference's
# data/run_DipGenie_batch.sh: for each sample in a list, run diploid
# inference against that sample's leave-one-out graph.
#
# Layout expectations (same as the reference harness):
#   $GRAPH_DIR/MHC_wo_${SAMPLE}.gfa.gz   leave-one-out graph
#   $READS_DIR/${SAMPLE}.${COV}.fq.gz    read sets (e.g. 2x/4x/full)
#   $OUT_DIR/${SAMPLE}_${COV}/full.fa    inferred diploid FASTA
set -euo pipefail

SAMPLES_FILE=${1:?usage: run_batch.sh samples.txt graph_dir reads_dir out_dir [cov] [threads]}
GRAPH_DIR=${2:?}
READS_DIR=${3:?}
OUT_DIR=${4:?}
COV=${5:-2x}
THREADS=${6:-$(nproc)}
R=${R:-18}
# extra CLI flags (e.g. "-k 5 -w 3" for small test fixtures)
DIPGENIE_ARGS=${DIPGENIE_ARGS:-}
# interpreter override (CI points this at the venv python)
PYTHON=${PYTHON:-python3}

mkdir -p "$OUT_DIR"
while read -r SAMPLE; do
    [ -z "$SAMPLE" ] && continue
    g="$GRAPH_DIR/MHC_wo_${SAMPLE}.gfa.gz"
    r="$READS_DIR/${SAMPLE}.${COV}.fq.gz"
    o="$OUT_DIR/${SAMPLE}_${COV}"
    mkdir -p "$o"
    echo "[run_batch] $SAMPLE ($COV)"
    "$PYTHON" -m dipgenie_tpu -t "$THREADS" -p 2 -R "$R" $DIPGENIE_ARGS \
        -g "$g" -r "$r" -o "$o/full.fa" 2> "$o/log.txt"
    # split the 2-record FASTA for downstream VCF generation
    awk '/^>/{n++} n==1' "$o/full.fa" > "$o/full_1.fa"
    awk '/^>/{n++} n==2' "$o/full.fa" > "$o/full_2.fa"
done < "$SAMPLES_FILE"
