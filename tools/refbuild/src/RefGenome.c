/* Minimal mrsFAST RefGenome.c replacement (parity-oracle build; see
 * inc/mrsfast/RefGenome.h for the call-site contract).  Streams the
 * GenomePacker's packed FASTA (one record per packed contig; records
 * may span multiple sequence lines, genome.cpp:120-135).  Contigs are
 * already <= CONTIG_SIZE < CONTIG_MAX_SIZE, so the chromosome-chunking
 * offset is always 0. */
#include <string.h>
#include "Common.h"
#include "RefGenome.h"

static FILE *_rg_fp = NULL;
static char *_rg_buf = NULL;       /* sequence buffer */
static char *_rg_name = NULL;
static int _rg_have_header = 0;    /* next record's header already read */

static int read_header(char *name_out) {
    int c, n = 0;
    while ((c = fgetc(_rg_fp)) != EOF && c != '>')
        ;
    if (c == EOF)
        return 0;
    /* name = token up to first whitespace; rest of line dropped */
    while ((c = fgetc(_rg_fp)) != EOF && c != '\n') {
        if (c == ' ' || c == '\t' || c == '\r') {
            while ((c = fgetc(_rg_fp)) != EOF && c != '\n')
                ;
            break;
        }
        if (n < CONTIG_NAME_SIZE - 1)
            name_out[n++] = (char) c;
    }
    name_out[n] = '\0';
    return 1;
}

int initLoadingRefGenome(char *fileName, char *genomeMetaInfo,
                         int *genomeMetaInfoLength) {
    _rg_fp = fileOpen(fileName, "r");
    _rg_buf = getMem((size_t) CONTIG_MAX_SIZE + 2);
    _rg_name = getMem(CONTIG_NAME_SIZE);

    /* prescan: per-record names and lengths -> the metaInfo block the
     * index loader re-parses (HashTable.c:617-634) */
    char *p = genomeMetaInfo + sizeof(int);
    int n_chr = 0;
    char name[CONTIG_NAME_SIZE];
    while (read_header(name)) {
        int len = 0, c;
        while ((c = fgetc(_rg_fp)) != EOF && c != '>') {
            if (c != '\n' && c != '\r')
                len++;
        }
        if (c == '>')
            ungetc('>', _rg_fp);
        int nameLen = (int) strlen(name);
        memcpy(p, &nameLen, sizeof(int));
        p += sizeof(int);
        memcpy(p, name, nameLen);
        p += nameLen;
        memcpy(p, &len, sizeof(int));
        p += sizeof(int);
        n_chr++;
    }
    memcpy(genomeMetaInfo, &n_chr, sizeof(int));
    *genomeMetaInfoLength = (int) (p - genomeMetaInfo);
    rewind(_rg_fp);
    _rg_have_header = 0;
    return 1;
}

int loadRefGenome(char **refGen, char **refGenName, int *refGenOffset,
                  int *refGenLength) {
    if (!_rg_have_header) {
        if (!read_header(_rg_name)) {
            *refGenLength = 0;
            return 0;
        }
    }
    unsigned int len = 0;
    int c;
    while ((c = fgetc(_rg_fp)) != EOF && c != '>') {
        if (c != '\n' && c != '\r' && len < CONTIG_MAX_SIZE)
            _rg_buf[len++] = (char) c;
    }
    _rg_buf[len] = '\0';
    *refGen = _rg_buf;
    *refGenName = _rg_name;
    *refGenOffset = 0;
    *refGenLength = (int) len;
    if (c == '>') {
        ungetc('>', _rg_fp);
        _rg_have_header = 0;
        return 1;              /* more records follow */
    }
    return 0;
}

void finalizeLoadingRefGenome(void) {
    if (_rg_fp) {
        fclose(_rg_fp);
        _rg_fp = NULL;
    }
    if (_rg_buf) {
        freeMem(_rg_buf, (size_t) CONTIG_MAX_SIZE + 2);
        _rg_buf = NULL;
    }
    if (_rg_name) {
        freeMem(_rg_name, CONTIG_NAME_SIZE);
        _rg_name = NULL;
    }
}
