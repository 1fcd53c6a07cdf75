#!/bin/sh
# Shard a preprocessed dataset directory into size-bounded tar.gz volumes for
# bulk transfer (parity: reference scripts/create_tars.sh).
#
#   sh scripts/create_tars.sh SOURCE_DIR DEST_DIR MAX_GB
#
# Files are walked in sorted order and greedily packed: a new volume starts
# whenever adding the next file would exceed MAX_GB. Volume names are
# <basename>_000.tar.gz, _001, ... relative paths inside the tar are rooted at
# SOURCE_DIR so extraction recreates the original tree.
#
# Limitation: file paths are processed line-by-line, so names containing
# newlines would corrupt the volume lists (fine for preprocessed dataset
# trees, which use sanitized scene names). A single file larger than MAX_GB
# gets its own oversized volume (warned).

set -e

SRC=$1
DST=$2
MAX_GB=${3:-10}

[ -d "$SRC" ] || { echo "source dir '$SRC' not found" >&2; exit 1; }
mkdir -p "$DST"

NAME=$(basename "$SRC")
LIMIT_KB=$(awk "BEGIN {printf \"%d\", $MAX_GB * 1024 * 1024}")

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

vol=0
size_kb=0
list="$TMP/vol_$vol"
: > "$list"

flush() {
  [ -s "$list" ] || return 0
  out=$(printf "%s/%s_%03d.tar.gz" "$DST" "$NAME" "$vol")
  echo "packing $out ($(wc -l < "$list") files, ~${size_kb} KB)"
  tar -zcf "$out" -C "$SRC" -T "$list"
}

( cd "$SRC" && find . -type f | sort ) > "$TMP/all_files"
while read -r f; do
  kb=$(du -k "$SRC/$f" | cut -f1)
  if [ "$kb" -gt "$LIMIT_KB" ]; then
    echo "warning: '$f' (${kb} KB) exceeds the ${LIMIT_KB} KB volume limit; packing an oversized volume" >&2
  fi
  if [ "$size_kb" -gt 0 ] && [ $((size_kb + kb)) -gt "$LIMIT_KB" ]; then
    flush
    vol=$((vol + 1))
    size_kb=0
    list="$TMP/vol_$vol"
    : > "$list"
  fi
  echo "$f" >> "$list"
  size_kb=$((size_kb + kb))
done < "$TMP/all_files"

flush
echo "done: $((vol + 1)) volume(s) in $DST"
