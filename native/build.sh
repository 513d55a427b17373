#!/bin/sh
# Build the native host runtime. Output lands next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libwhisper_host.so whisper_host.cpp
echo "built $(pwd)/libwhisper_host.so"
