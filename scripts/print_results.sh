#!/usr/bin/env bash
# Evaluation aggregators — equivalents of the reference's
# data/print_SER_*.sh, print_F1_*.sh, print_SVs_*.sh, print_len_*.sh,
# parameterized over the results tree so one script serves both the
# DipGenie and the VG-baseline runs.
#
# Usage:
#   print_results.sh ser  <eval_dir>       # Sample  Depth  SwitchErrorRate
#   print_results.sh f1   <sv_eval_dir>    # Sample  Depth  F1_Score
#   print_results.sh svs  <results_dir>    # Sample  Coverage  SV_count
#   print_results.sh len  <results_dir>    # Sample  Coverage  Asm_lens_Mb
#
# Tree layouts match the reference harness:
#   ser: <eval_dir>/<SAMPLE>/<SAMPLE>_<depth>/SER.txt   (whatshap compare)
#   f1:  <sv_eval_dir>/<SAMPLE>/<SAMPLE>_<depth>/bench/log.txt (truvari)
#   svs: <results_dir>/<SAMPLE>/<SAMPLE>_<cov>/MHC_<SAMPLE>_<cov>.vcf.gz
#   len: <results_dir>/<SAMPLE>/<SAMPLE>_<cov>/full_*.fa
set -euo pipefail
shopt -s nullglob

MODE=${1:?usage: print_results.sh ser|f1|svs|len <dir> [depths...]}
DIR=${2:?}
shift 2
DEPTHS=("${@:-}")
[ -z "${DEPTHS[0]:-}" ] && DEPTHS=(2x 4x full)

case "$MODE" in
ser)
    echo -e "Sample\tDepth\tSwitchErrorRate"
    for depth in "${DEPTHS[@]}"; do
        for ser in "$DIR"/*/*_"${depth}"/SER.txt; do
            sample="$(basename "$(dirname "$(dirname "$ser")")")"
            rate="$(grep -m1 'switch error rate' "$ser" | awk '{print $NF}')"
            [ -n "$rate" ] || rate="NA"
            echo -e "${sample}\t${depth}\t${rate}"
        done
    done
    ;;
f1)
    echo -e "Sample\tDepth\tF1_Score"
    for depth in "${DEPTHS[@]}"; do
        for log in "$DIR"/*/*_"${depth}"/bench/log.txt; do
            sample="$(basename "$(dirname "$(dirname "$(dirname "$log")")")")"
            f1="$(grep -m1 '"f1"' "$log" | awk -F': ' '{print $2}' | tr -d ', ')"
            [ -n "$f1" ] || f1="NA"
            echo -e "${sample}\t${depth}\t${f1}"
        done
    done
    ;;
svs)
    echo -e "Sample\tCoverage\tSV_count"
    for d in "$DIR"/*/; do
        s="$(basename "$d")"
        for cov in "${DEPTHS[@]}"; do
            vcf="$DIR/$s/${s}_${cov}/MHC_${s}_${cov}.vcf.gz"
            if [ -f "$vcf" ]; then
                count=$(bcftools query -f '%REF\t%ALT\n' "$vcf" 2>/dev/null \
                    | awk '{split($2,a,","); for(i in a) if (length(a[i]) - length($1) >= 50 || length($1) - length(a[i]) >= 50) c++} END{print c+0}')
                echo -e "${s}\t${cov}\t${count}"
            else
                echo -e "${s}\t${cov}\tNA"
            fi
        done
    done
    ;;
len)
    echo -e "Sample\tCoverage\tAsm_lens_Mb"
    for d in "$DIR"/*/; do
        s="$(basename "$d")"
        for cov in "${DEPTHS[@]}"; do
            rd="$DIR/$s/${s}_${cov}"
            asm="NA"
            if compgen -G "${rd}/full_*.fa" > /dev/null; then
                asm=$(seqkit stats "${rd}"/full_*.fa -T 2>/dev/null \
                    | awk 'NR>1 {printf("%.2f|", $5/1e6)}' | sed 's/|$//')
                [ -z "$asm" ] && asm="NA"
            fi
            echo -e "${s}\t${cov}\t${asm}"
        done
    done
    ;;
*)
    echo "unknown mode: $MODE" >&2
    exit 2
    ;;
esac
