#!/bin/bash
# Build the reference CircMiner binary as a parity oracle, out-of-tree
# (the reference checkout is read-only and its lib/ submodules are
# empty; the missing mrsFAST/util-logger pieces are the minimal
# replacements under inc/ and src/, reconstructed from call sites).
# Usage: tools/refbuild/build.sh [outdir]   -> outdir/circminer_ref
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
OUT=${1:-/tmp/refbuild}
mkdir -p "$OUT/obj"

CFLAGS="-O2 -w"
CXXFLAGS="-O2 -w -std=c++14"
CINC="-I $HERE/inc/mrsfast -I $REF/src/mrsfast"
CXXINC="-I $HERE/inc -I $HERE/inc/mrsfast -I $REF/src"

# mrsFAST C core: the reference's own HashTable.c/Sort.c + the stubs
for f in HashTable Sort; do
    gcc $CFLAGS $CINC -c "$REF/src/mrsfast/$f.c" -o "$OUT/obj/$f.o"
done
for f in Common RefGenome; do
    gcc $CFLAGS $CINC -c "$HERE/src/$f.c" -o "$OUT/obj/$f.o"
done

# CircMiner C++ sources (edlib is vendored by the original build but
# never called — SURVEY.md; skip it)
CPPS="circminer utils output filter match_read fastq_parser \
      commandline_parser chain gene_annotation align common hash_table \
      process_circ extend genome"
for f in $CPPS; do
    g++ $CXXFLAGS $CXXINC -c "$REF/src/$f.cpp" -o "$OUT/obj/cpp_$f.o"
done

g++ "$OUT"/obj/*.o -o "$OUT/circminer_ref" -lz -lm -lpthread
echo "built $OUT/circminer_ref"
