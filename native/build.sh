#!/bin/sh
# Build the native IO library. Called automatically by io/native.py on
# first use; idempotent (skips when the .so is newer than the source).
set -e
cd "$(dirname "$0")"
if [ libgpio.so -nt gpio.cpp ] 2>/dev/null; then
    exit 0
fi
g++ -O3 -std=c++17 -shared -fPIC -o libgpio.so gpio.cpp
