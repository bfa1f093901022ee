#!/usr/bin/env bash
# Fetch the HumSyn kern corpora (six public GitHub repositories) and collect
# them under data_processing/kern/ with composer-prefixed filenames —
# the input corpus for `python prepare_data.py syn` (pretrain synthesis).
set -euo pipefail

mkdir -p data_processing
cd data_processing
mkdir -p kern

declare -A REPOS=(
  [beethoven]=https://github.com/craigsapp/beethoven-piano-sonatas.git
  [haydn]=https://github.com/craigsapp/haydn-piano-sonatas.git
  [mozart]=https://github.com/craigsapp/mozart-piano-sonatas.git
  [scarlatti]=https://github.com/craigsapp/scarlatti-keyboard-sonatas.git
  [chopin]=https://github.com/pl-wnifc/humdrum-chopin-first-editions.git
  [joplin]=https://github.com/craigsapp/joplin.git
)

for composer in "${!REPOS[@]}"; do
  repo_dir=$(basename "${REPOS[$composer]}" .git)
  if [ ! -d "$repo_dir" ]; then
    git clone --depth 1 "${REPOS[$composer]}"
  fi
  for file in "$repo_dir"/kern/*.krn; do
    cp "$file" "kern/${composer}#$(basename "$file")"
  done
done

echo "collected $(ls kern | wc -l) kern scores"
