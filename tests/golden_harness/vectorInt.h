/* Stub vectorInt.h for compiling /root/reference/libsql/vectordiskann.c.
 *
 * Declares the Vector value type and the helper functions vectordiskann.c
 * calls. Implementations live in shims.c. Float32 is the only vector
 * representation the golden scenarios use (edge compression off), so the
 * distance semantics here are pinned, documented, and mirrored bit-for-bit
 * by tests/oracle_libsql.py:
 *   L2  : float32 accumulation of squared diffs, sqrtf at the end
 *   COS : float32 dot/norms, 1 - clamp(dot / (sqrt(na)*sqrt(nb))) in double,
 *         rounded back to float
 * Golden datasets are integer-valued, so the f32 sums are order-invariant
 * and reproduce exactly in NumPy.
 */
#ifndef GOLDEN_VECTORINT_H
#define GOLDEN_VECTORINT_H

#include "sqliteInt.h"

#define MAX_VECTOR_SZ 65536

#define VECTOR_TYPE_FLOAT32 1
#define VECTOR_TYPE_FLOAT64 2
#define VECTOR_TYPE_FLOAT1BIT 3
#define VECTOR_TYPE_FLOAT8 4
#define VECTOR_TYPE_FLOAT16 5
#define VECTOR_TYPE_FLOATB16 6

typedef struct Vector Vector;
struct Vector {
  u32 type;  /* VECTOR_TYPE_* */
  u32 dims;
  void *data;
};

Vector *vectorAlloc(int type, int dims);
void vectorFree(Vector *pVector);
void vectorInitStatic(Vector *pVector, int type, int dims, void *pData);
int vectorDataSize(int type, int dims);
void vectorConvert(const Vector *pFrom, Vector *pTo);
void vectorDump(const Vector *pVector);
void vectorSerializeToBlob(const Vector *pVector, unsigned char *pBlob,
                           size_t nBlobSize);
float vectorDistanceL2(const Vector *pVec1, const Vector *pVec2);
float vectorDistanceCos(const Vector *pVec1, const Vector *pVec2);

#endif /* GOLDEN_VECTORINT_H */
