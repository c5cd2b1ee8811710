#!/bin/sh
# Build the native video decoder (libvideodec.so) against system FFmpeg.
set -e
cd "$(dirname "$0")"
OUT="${1:-libvideodec.so}"
g++ -O2 -shared -fPIC -o "$OUT" videodec.cpp \
    -lavformat -lavcodec -lavutil -lswscale
echo "built $OUT"
