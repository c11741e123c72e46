#!/bin/bash
# Sanitizer pass over the native runtime (jdt_entropy.cpp / jdt_encode.cpp).
#
# Builds libjdt with ASan+UBSan (memory safety) and then TSan (the threaded
# segment-parallel decode, speculative workers, and concurrent encoder
# packing), and drives each build through the native test suite plus a
# fuzz/stress workload via LD_PRELOAD. Memory safety vs the segfaulting
# reference is a headline claim (README capability table); this is the
# proof artifact. Results land in tests/tools/sanitize_report.txt.
#
# Usage: bash tests/tools/sanitize.sh   (from the repo root; ~3-5 min)
set -u
cd "$(dirname "$0")/../.."
REPO="$PWD"
SRC="jpeg_decoder_tpu/native/src"
OUT="jpeg_decoder_tpu/native/build"
REPORT="tests/tools/sanitize_report.txt"
mkdir -p "$OUT"

# The sanitized lib replaces the hash-named production lib via JDT_LIB.
run_python_suite() {
    local libpath="$1"; shift
    local preload="$1"; shift
    JDT_LIB="$libpath" LD_PRELOAD="$preload" \
    ASAN_OPTIONS="detect_leaks=0:abort_on_error=1" \
    UBSAN_OPTIONS="halt_on_error=1:print_stacktrace=1" \
    TSAN_OPTIONS="halt_on_error=1:report_bugs=1:second_deadlock_stack=1:suppressions=$REPO/tests/tools/tsan.supp" \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    timeout 1200 python -m pytest \
        tests/test_native.py tests/test_speculative.py \
        tests/test_robustness.py tests/test_wild_corpus.py \
        tests/test_progressive.py tests/test_progressive_edge.py \
        tests/test_encoder.py tests/test_12bit.py \
        tests/test_parallel.py \
        -q -p no:cacheprovider -x "$@" 2>&1
}

status=0
{
    echo "== native runtime sanitizer pass: $(date -u +%Y-%m-%dT%H:%M:%SZ) =="
    echo "g++: $(g++ --version | head -1)"

    echo
    echo "---- ASan + UBSan ----"
    g++ -O1 -g -std=c++17 -fPIC -shared -pthread \
        -fsanitize=address,undefined -fno-sanitize-recover=all \
        "$SRC/jdt_entropy.cpp" "$SRC/jdt_encode.cpp" \
        -o "$OUT/libjdt-asan.so" || { echo "ASAN BUILD FAILED"; exit 1; }
    ASAN_RT=$(g++ -print-file-name=libasan.so)
    UBSAN_RT=$(g++ -print-file-name=libubsan.so)
    if out=$(run_python_suite "$REPO/$OUT/libjdt-asan.so" "$ASAN_RT $UBSAN_RT"); then
        echo "$out" | tail -2
        echo "ASAN+UBSAN: CLEAN"
    else
        echo "$out" | tail -40
        echo "ASAN+UBSAN: FAILED"
        status=1
    fi

    echo
    echo "---- ASan + UBSan mutation fuzz (tests/tools/fuzz.py) ----"
    if out=$(JDT_LIB="$REPO/$OUT/libjdt-asan.so" \
             LD_PRELOAD="$ASAN_RT $UBSAN_RT" \
             ASAN_OPTIONS="detect_leaks=0:abort_on_error=1" \
             UBSAN_OPTIONS="halt_on_error=1:print_stacktrace=1" \
             JAX_PLATFORMS=cpu \
             timeout 1200 python tests/tools/fuzz.py --cases 3000 \
                 --report tests/tools/fuzz_report_asan.json 2>&1); then
        echo "$out" | tail -6
        echo "FUZZ(ASAN): PASS"
    else
        echo "$out" | tail -30
        echo "FUZZ(ASAN): FAILED"
        status=1
    fi

    echo
    echo "---- TSan ----"
    g++ -O1 -g -std=c++17 -fPIC -shared -pthread \
        -fsanitize=thread \
        "$SRC/jdt_entropy.cpp" "$SRC/jdt_encode.cpp" \
        -o "$OUT/libjdt-tsan.so" || { echo "TSAN BUILD FAILED"; exit 1; }
    TSAN_RT=$(g++ -print-file-name=libtsan.so)
    if out=$(run_python_suite "$REPO/$OUT/libjdt-tsan.so" "$TSAN_RT" \
             -k "not robustness"); then
        echo "$out" | tail -2
        echo "TSAN: CLEAN"
    else
        echo "$out" | tail -40
        echo "TSAN: FAILED"
        status=1
    fi
} | tee "$REPORT"
exit $status
