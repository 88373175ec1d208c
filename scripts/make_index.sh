#!/bin/sh
# Generic index recipe: fetch a reference genome (wget or curl) and
# build a bowtie-tpu index from it.  The per-genome make_*.sh wrappers
# call this with a genome name and one or more source URLs.
# (Counterpart of the reference's scripts/make_*.sh recipe family.)
#
# Usage: make_index.sh <index_name> <url> [url ...]
#        BUILD_ARGS="..." make_index.sh hg38 https://...

set -e

NAME="$1"
shift
[ -n "$NAME" ] && [ $# -ge 1 ] || {
    echo "usage: $0 <index_name> <url> [url ...]" >&2; exit 1; }

BUILD=""
for cand in "$(dirname "$0")/../bin/bowtie-tpu-build" bowtie-tpu-build; do
    if command -v "$cand" > /dev/null 2>&1; then BUILD="$cand"; break; fi
done
[ -n "$BUILD" ] || { echo "bowtie-tpu-build not found" >&2; exit 1; }

fetch() {
    url="$1"; out="$2"
    [ -f "$out" ] && return 0
    if command -v wget > /dev/null 2>&1; then
        wget -O "$out" "$url"
    elif command -v curl > /dev/null 2>&1; then
        curl -L -o "$out" "$url"
    else
        echo "need wget or curl to download $url" >&2; exit 1
    fi
}

INPUTS=""
for url in "$@"; do
    f=$(basename "$url")
    fetch "$url" "$f"
    case "$f" in
        *.gz) gunzip -kf "$f"; f=${f%.gz} ;;
        *.zip) unzip -o "$f"; f=${f%.zip} ;;
    esac
    INPUTS="$INPUTS${INPUTS:+,}$f"
done

echo "Building $NAME from $INPUTS"
"$BUILD" $BUILD_ARGS "$INPUTS" "$NAME"
echo "Done.  Move $NAME.*.ebwt to your BOWTIE_INDEXES directory."
