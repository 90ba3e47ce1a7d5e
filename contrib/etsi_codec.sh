#!/bin/sh
# Fetch and build the ETSI TETRA ACELP reference codec (EN 300 395-2
# part 2 C code) so the receiver's traffic dumps can be decoded to
# speech — the analogue of the reference repo's etsi_codec-patches/
# workflow (see /root/reference/etsi_codec-patches/README for the
# upstream description; this script is an independent implementation).
#
# Requires network access. The receiver side needs nothing from this —
# it already writes the decoder's input formats:
#
#   traffic_<usage>_<tn>.out : the patched-ETSI-cdecoder stream the
#       reference produces too (per slot: 6 sync markers 0x6B21+i then
#       114/114/114/90 soft bits as int16 +-127; tetra_lower_mac.c:198-241)
#   voice_<usage>_<tn>.cod   : packed 137-bit ACELP codec frames from the
#       on-device TCH/S FEC chain (a capability the reference leaves
#       unwired) — unpack to one-bit-per-int16 to feed cdecoder.
#
# Usage: contrib/etsi_codec.sh [builddir]   (default ./etsi_codec)
set -e

URL=http://www.etsi.org/deliver/etsi_en/300300_300399/30039502/01.03.01_60/en_30039502v010301p0.zip
MD5_EXP=a8115fe68ef8f8cc466f4192572a1e3e
DIR=${1:-etsi_codec}

mkdir -p "$DIR"
cd "$DIR"

if [ ! -f etsi_tetra_codec.zip ]; then
    echo "Downloading ETSI EN 300 395-2 reference codec..."
    (command -v curl >/dev/null && curl -L -o etsi_tetra_codec.zip "$URL") \
        || wget -O etsi_tetra_codec.zip "$URL" \
        || { echo "ERROR: download failed (no network?). Fetch $URL" \
             "manually into $DIR/etsi_tetra_codec.zip"; exit 1; }
fi

MD5=$(md5sum etsi_tetra_codec.zip | cut -d' ' -f1)
[ "$MD5" = "$MD5_EXP" ] || {
    echo "ERROR: md5 mismatch ($MD5 != $MD5_EXP)"; exit 1; }

# -L lower-cases the DOS-era uppercase names
unzip -oL etsi_tetra_codec.zip
SRC=$(find . -iname 'cdecoder.c' | head -1)
[ -n "$SRC" ] || { echo "ERROR: codec source layout unexpected"; exit 1; }
CDIR=$(dirname "$SRC")

# The ETSI code is K&R-era C that assumes 32-bit long and tolerates
# implicit declarations / common symbols; modern gcc needs:
CFLAGS="-O2 -fcommon -std=gnu89 -Wno-implicit-int -Wno-implicit-function-declaration"
echo "Building in $CDIR..."
(cd "$CDIR" && \
    gcc $CFLAGS -o cdecoder *.c 2>/dev/null || \
    gcc $CFLAGS -o cdecoder cdecoder.c sdec_tet.c sub_dsp.c tetra_op.c \
        fexp_tet.c fmat_tet.c 2>/dev/null || \
    { echo "NOTE: single-binary build failed; consult the sources'" \
           "own makefiles (decoder usually = cdecoder.c + sdec_tet.c" \
           "+ sub_*.c + tetra_op.c)"; exit 1; })

echo "OK: $CDIR/cdecoder"
echo "Decode a capture's traffic dump to raw speech:"
echo "  $CDIR/cdecoder traffic_5_1.out speech.raw"
