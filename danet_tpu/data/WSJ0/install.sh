#!/bin/bash
# WSJ0 installation: build file lists for the si_tr_s/si_dt_05/si_et_05
# splits and run preprocessing (mirrors the reference flow,
# /root/reference/app/datasets/WSJ0/install.sh).  SPHERE decoding uses the
# bundled native C++ decoder (danet_tpu/native) — no sph2pipe download
# needed; an existing sph2pipe binary is used as fallback if the native
# build is unavailable.
set -u
cd "$(dirname "$0")"

# build the native SPHERE decoder if not present
if ! python -c "from danet_tpu.native.sphere import read_sphere" 2>/dev/null; then
    (cd ../../native && make) || echo "native decoder build failed; will try sph2pipe fallback"
fi

find -L . -type f -path "*si_tr_s*.wv1" > train_set_files
find -L . -type f -path "*si_dt_05*.wv1" > valid_set_files
find -L . -type f -path "*si_et_05*.wv1" > test_set_files

if [[ ${1:-} ]]; then
    python process.py -o "$1"
else
    python process.py
fi
