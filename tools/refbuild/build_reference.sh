#!/bin/sh
# Build the reference SVT-AV1 encoder WITHOUT nasm/yasm (this image has
# neither): drop the .asm sources from the SSE2 tier and link C
# forwarding stubs in their place (nasm_stubs.c); every intrinsics tier
# (SSE2/SSSE3/SSE4.1/AVX2 .c files) still builds, so the binary runs at
# near-full reference speed.  Used by tools/bdrate_ref.py to produce
# the BD-rate anchor (BASELINE.md: <=0.5% BD-rate target).
#
#   sh tools/refbuild/build_reference.sh /root/reference /tmp/refsrc /tmp/refbuild
# -> /tmp/refsrc/Bin/Release/SvtAv1EncApp
set -e
SRC=${1:-/root/reference}
COPY=${2:-/tmp/refsrc}
BUILD=${3:-/tmp/refbuild}
HERE=$(dirname "$0")
if [ ! -d "$COPY" ]; then
    cp -r "$SRC" "$COPY"
    sed -i 's/project(${project_name} C CXX ASM_NASM)/project(${project_name} C CXX)/' "$COPY/CMakeLists.txt"
    sed -i 's/^\s*"\*\.asm"\s*$//' "$COPY/Source/Lib/Common/ASM_SSE2/CMakeLists.txt"
    cp "$HERE/nasm_stubs.c" "$COPY/Source/Lib/Common/ASM_SSE2/nasm_stubs.c"
    # recon FIFO in this snapshot deadlocks the pipeline; patch in a
    # direct file dump (env SVT_RECON_DUMP) used by tools/bdrate_ref.py
    REFSRC_COPY="$COPY" python "$HERE/recon_dump_patch.py"
fi
mkdir -p "$BUILD"
cd "$BUILD"
cmake "$COPY" -GNinja -DCMAKE_BUILD_TYPE=Release
ninja SvtAv1EncApp
echo "built: $COPY/Bin/Release/SvtAv1EncApp"
