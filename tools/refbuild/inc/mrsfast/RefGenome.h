/* Minimal mrsFAST RefGenome.h replacement (parity-oracle build; see
 * Common.h header comment).  FASTA streaming for the index builder:
 * call-site contract from src/mrsfast/HashTable.c:285-380 —
 *   initLoadingRefGenome(fileName, metaBuf, &metaLen): open + prescan;
 *     metaBuf receives [int nChrs]{[int nameLen][name][int chrLen]}*
 *     (the exact block initLoadingHashTableMeta re-parses at :617-634).
 *   loadRefGenome(&seq, &name, &offset, &len): next record; returns 1
 *     while more records remain after this one (the do/while flag and
 *     the saved per-contig extraInfo byte), 0 on the last.
 */
#ifndef __MRSFAST_REFGENOME_STUB__
#define __MRSFAST_REFGENOME_STUB__

#ifdef __cplusplus
extern "C" {
#endif

int initLoadingRefGenome(char *fileName, char *genomeMetaInfo,
                         int *genomeMetaInfoLength);
int loadRefGenome(char **refGen, char **refGenName, int *refGenOffset,
                  int *refGenLength);
void finalizeLoadingRefGenome(void);

#ifdef __cplusplus
}
#endif

#endif
