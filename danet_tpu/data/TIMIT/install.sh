#!/bin/bash
# TIMIT installation: unzip, flatten train/test, convert NIST WAVs, run
# the preprocessing (mirrors the reference flow,
# /root/reference/app/datasets/TIMIT/install.sh).
set -u
cd "$(dirname "$0")"

if [ ! -f TIMIT.zip ]; then
    echo 'TIMIT.zip not found. Please download it and place it here.'; exit 1
fi
unzip -o -q TIMIT.zip
mkdir -p train test

for ext in WAV PHN TXT; do
    find . -type f -name "*.${ext}" -path "*TRAIN*" -exec mv {} train/ \;
    find . -type f -name "*.${ext}" -path "*TEST*" -exec mv {} test/ \;
done

# convert NIST SPHERE-headered WAVs to RIFF wav (lowercase names)
convert_dir() {
    cd "$1"
    for file in *.WAV; do
        [ -e "$file" ] || continue
        lower=$(echo "$file" | tr '[:upper:]' '[:lower:]')
        if command -v sndfile-convert > /dev/null; then
            sndfile-convert "$file" "$lower"
        else
            # fall back to the bundled native SPHERE decoder
            # (cwd is danet_tpu/data/TIMIT/{train,test} here)
            python ../../../native/sphere_convert.py "$file" "$lower" || exit 1
        fi
    done
    rm -f ./*.WAV
    cd ..
}
convert_dir train
convert_dir test

python process.py || exit 1
rm -rf test/ train/
echo 'Installation done'
