/* Minimal mrsFAST Common.c replacement (parity-oracle build; see
 * inc/mrsfast/Common.h). */
#include <string.h>
#include <sys/time.h>
#include "Common.h"

int SEQ_LENGTH = 100;

FILE *fileOpen(char *fileName, const char *mode) {
    FILE *fp = fopen(fileName, mode);
    if (fp == NULL) {
        fprintf(stderr, "Error: cannot open file %s\n", fileName);
        exit(EXIT_FAILURE);
    }
    return fp;
}

double getTime(void) {
    struct timeval t;
    gettimeofday(&t, NULL);
    return t.tv_sec + t.tv_usec / 1e6;
}

void *getMem(size_t size) {
    void *p = calloc(1, size > 0 ? size : 1);
    if (p == NULL) {
        fprintf(stderr, "Error: cannot allocate %zu bytes\n", size);
        exit(EXIT_FAILURE);
    }
    return p;
}

void freeMem(void *ptr, size_t size) {
    (void) size;
    free(ptr);
}

unsigned int calculateCompressedLen(unsigned int normalLen) {
    return normalLen / 21 + (normalLen % 21 ? 1 : 0);
}

static int pack2bit(char *seq, int n) {
    int i, val = 0;
    for (i = 0; i < n; i++) {
        switch (seq[i]) {
            case 'A': val = (val << 2) | 0; break;
            case 'C': val = (val << 2) | 1; break;
            case 'G': val = (val << 2) | 2; break;
            case 'T': val = (val << 2) | 3; break;
            default: return -1;
        }
    }
    return val;
}

int hashVal(char *seq) {
    return pack2bit(seq, WINDOW_SIZE);
}

int checkSumVal(char *seq) {
    if (checkSumLength == 0)
        return 0;
    return pack2bit(seq, checkSumLength);
}

void initCommon(void) {
}

void compressSequence(char *seq, unsigned int len, CompressedSeq *out) {
    unsigned int i = 0, w = 0;
    while (i < len) {
        CompressedSeq word = 0;
        int j;
        for (j = 0; j < 21; j++) {
            int val = 4;
            if (i < len) {
                switch (seq[i]) {
                    case 'A': val = 0; break;
                    case 'C': val = 1; break;
                    case 'G': val = 2; break;
                    case 'T': val = 3; break;
                    default: val = 4; break;
                }
                i++;
            } else {
                val = 0;
            }
            word = (word << 3) | (CompressedSeq) val;
        }
        /* 21 x 3 = 63 bits: base 0 lands in bits 62..60, bit 63 clear —
         * exactly what pac2char_otf's (crdata >> 60) & 7 decodes */
        out[w++] = word;
    }
}
