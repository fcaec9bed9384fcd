/* Shim implementations for compiling /root/reference/libsql/vectordiskann.c
 * standalone against the system libsqlite3. See README.md in this directory.
 *
 * Everything here either forwards to the public SQLite API or implements
 * the small libSQL vector-module helpers (float32 only) whose semantics the
 * Python replay (tests/oracle_libsql.py) mirrors bit-for-bit.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "sqliteInt.h"
#include "vectorInt.h"
#include "vectorIndexInt.h"

/* ---- Db-scoped allocator shims (plain allocator underneath) ---- */

void *sqlite3DbMallocRaw(sqlite3 *db, u64 n) {
  (void)db;
  return sqlite3_malloc((int)n);
}

void sqlite3DbFree(sqlite3 *db, void *p) {
  (void)db;
  sqlite3_free(p);
}

char *sqlite3DbStrDup(sqlite3 *db, const char *z) {
  (void)db;
  if (z == NULL) return NULL;
  size_t n = strlen(z) + 1;
  char *out = sqlite3_malloc((int)n);
  if (out != NULL) memcpy(out, z, n);
  return out;
}

char *sqlite3MPrintf(sqlite3 *db, const char *zFormat, ...) {
  (void)db;
  va_list ap;
  va_start(ap, zFormat);
  char *out = sqlite3_vmprintf(zFormat, ap);
  va_end(ap);
  return out;
}

/* ---- Trace capture: DiskAnnTrace lines accumulate here; the driver
 *      consumes and resets the buffer per operation. ---- */

static char golden_log_buf[1 << 22];
static size_t golden_log_len = 0;

void sqlite3DebugPrintf(const char *zFormat, ...) {
  va_list ap;
  va_start(ap, zFormat);
  size_t room = sizeof(golden_log_buf) - golden_log_len;
  if (room > 1) {
    int n = vsnprintf(golden_log_buf + golden_log_len, room, zFormat, ap);
    if (n > 0) golden_log_len += ((size_t)n < room ? (size_t)n : room - 1);
  }
  va_end(ap);
}

const char *goldenLog(void) {
  golden_log_buf[golden_log_len] = 0;
  return golden_log_buf;
}

void goldenLogReset(void) { golden_log_len = 0; }

/* ---- Vector helpers (float32 only) ---- */

Vector *vectorAlloc(int type, int dims) {
  assert(type == VECTOR_TYPE_FLOAT32);
  Vector *v = sqlite3_malloc((int)sizeof(Vector));
  if (v == NULL) return NULL;
  v->type = type;
  v->dims = dims;
  v->data = sqlite3_malloc(vectorDataSize(type, dims));
  if (v->data == NULL) {
    sqlite3_free(v);
    return NULL;
  }
  return v;
}

void vectorFree(Vector *pVector) {
  if (pVector == NULL) return;
  sqlite3_free(pVector->data);
  sqlite3_free(pVector);
}

void vectorInitStatic(Vector *pVector, int type, int dims, void *pData) {
  pVector->type = type;
  pVector->dims = dims;
  pVector->data = pData;
}

int vectorDataSize(int type, int dims) {
  assert(type == VECTOR_TYPE_FLOAT32);
  return dims * (int)sizeof(float);
}

void vectorConvert(const Vector *pFrom, Vector *pTo) {
  /* Only reachable when edge compression is enabled; golden scenarios keep
   * node and edge types equal, so this must never run. */
  (void)pFrom;
  (void)pTo;
  assert(0 && "vectorConvert unused in golden scenarios");
}

void vectorDump(const Vector *pVector) {
  sqlite3DebugPrintf("[vector dims=%u]\n", pVector->dims);
}

void vectorSerializeToBlob(const Vector *pVector, unsigned char *pBlob,
                           size_t nBlobSize) {
  size_t n = (size_t)vectorDataSize(pVector->type, pVector->dims);
  assert(n <= nBlobSize);
  memcpy(pBlob, pVector->data, n);
}

float vectorDistanceL2(const Vector *pVec1, const Vector *pVec2) {
  const float *x = (const float *)pVec1->data;
  const float *y = (const float *)pVec2->data;
  float sum = 0.0f;
  u32 i;
  assert(pVec1->dims == pVec2->dims);
  for (i = 0; i < pVec1->dims; i++) {
    float d = x[i] - y[i];
    sum += d * d;
  }
  return sqrtf(sum);
}

float vectorDistanceCos(const Vector *pVec1, const Vector *pVec2) {
  const float *x = (const float *)pVec1->data;
  const float *y = (const float *)pVec2->data;
  float dot = 0.0f, na = 0.0f, nb = 0.0f;
  double cosv;
  u32 i;
  assert(pVec1->dims == pVec2->dims);
  for (i = 0; i < pVec1->dims; i++) {
    dot += x[i] * y[i];
    na += x[i] * x[i];
    nb += y[i] * y[i];
  }
  if (na <= 0.0f || nb <= 0.0f) return 1.0f;
  cosv = (double)dot / (sqrt((double)na) * sqrt((double)nb));
  if (cosv > 1.0) cosv = 1.0;
  if (cosv < -1.0) cosv = -1.0;
  return (float)(1.0 - cosv);
}

/* ---- VectorIdxParams: [u8 tag][u64 LE payload] records; last tag wins ---- */

static u64 paramsReadLE64(const u8 *p) {
  u64 v = 0;
  int i;
  for (i = 7; i >= 0; i--) v = (v << 8) | p[i];
  return v;
}

static void paramsWriteLE64(u8 *p, u64 v) {
  int i;
  for (i = 0; i < 8; i++) {
    p[i] = (u8)(v & 0xff);
    v >>= 8;
  }
}

void vectorIdxParamsInit(VectorIdxParams *pParams, u8 *pBuf, int nBufSize) {
  pParams->nBinSize = 0;
  if (pBuf != NULL && nBufSize > 0) {
    memcpy(pParams->pBinBuf, pBuf, nBufSize);
    pParams->nBinSize = nBufSize;
  }
}

u64 vectorIdxParamsGetU64(const VectorIdxParams *pParams, char tag) {
  u64 value = 0;
  int i;
  for (i = 0; i + 9 <= pParams->nBinSize; i += 9) {
    if ((char)pParams->pBinBuf[i] == tag) {
      value = paramsReadLE64(pParams->pBinBuf + i + 1);
    }
  }
  return value;
}

int vectorIdxParamsPutU64(VectorIdxParams *pParams, char tag, u64 value) {
  if (pParams->nBinSize + 9 > VECTOR_INDEX_PARAMS_BUF_SIZE) return 1;
  pParams->pBinBuf[pParams->nBinSize] = (u8)tag;
  paramsWriteLE64(pParams->pBinBuf + pParams->nBinSize + 1, value);
  pParams->nBinSize += 9;
  return 0;
}

double vectorIdxParamsGetF64(const VectorIdxParams *pParams, char tag) {
  u64 bits = vectorIdxParamsGetU64(pParams, tag);
  double out;
  memcpy(&out, &bits, sizeof(out));
  return out;
}

int vectorIdxParamsPutF64(VectorIdxParams *pParams, char tag, double value) {
  u64 bits;
  memcpy(&bits, &value, sizeof(bits));
  return vectorIdxParamsPutU64(pParams, tag, bits);
}

/* ---- VectorIdxKey / VectorInRow / VectorOutRows (single INTEGER
 *      rowid-like key — the only shape the golden scenarios use) ---- */

int vectorIdxKeyRowidLike(const VectorIdxKey *pKey) {
  return pKey->nKeyColumns == 1 && pKey->aKeyAffinity[0] == 'i';
}

int vectorIdxKeyDefsRender(const VectorIdxKey *pKey, const char *zPrefix,
                           char *pBuf, int nBufSize) {
  assert(pKey->nKeyColumns == 1 && pKey->aKeyAffinity[0] == 'i');
  return snprintf(pBuf, nBufSize, "%s INTEGER", zPrefix) >= nBufSize;
}

int vectorIdxKeyNamesRender(int nKeyColumns, const char *zPrefix, char *pBuf,
                            int nBufSize) {
  assert(nKeyColumns == 1);
  return snprintf(pBuf, nBufSize, "%s", zPrefix) >= nBufSize;
}

sqlite3_value *vectorInRowKey(const VectorInRow *pVectorInRow, int iKey) {
  assert(iKey == 0 && pVectorInRow->nKeys == 1);
  return pVectorInRow->pKeyValues;
}

int vectorInRowTryGetRowid(const VectorInRow *pVectorInRow, u64 *nRowid) {
  if (pVectorInRow->nKeys != 1) return 1;
  *nRowid = (u64)sqlite3_value_int64(pVectorInRow->pKeyValues);
  return 0;
}

int vectorInRowPlaceholderRender(const VectorInRow *pVectorInRow, char *pBuf,
                                 int nBufSize) {
  assert(pVectorInRow->nKeys == 1);
  return snprintf(pBuf, nBufSize, "?") >= nBufSize;
}

int vectorOutRowsAlloc(sqlite3 *db, VectorOutRows *pRows, int nRows, int nCols,
                       int rowidLike) {
  (void)db;
  assert(rowidLike && nCols == 1);
  pRows->nRows = nRows;
  pRows->nCols = nCols;
  pRows->ppValues = NULL;
  pRows->aIntValues = sqlite3_malloc((int)(sizeof(i64) * (nRows > 0 ? nRows : 1)));
  return pRows->aIntValues == NULL ? SQLITE_NOMEM : SQLITE_OK;
}

int vectorOutRowsPut(VectorOutRows *pRows, int iRow, int iCol, const u64 *pInt,
                     sqlite3_value *pValue) {
  (void)pValue;
  assert(iCol == 0 && pInt != NULL);
  assert(0 <= iRow && iRow < pRows->nRows);
  pRows->aIntValues[iRow] = (i64)*pInt;
  return SQLITE_OK;
}

void vectorOutRowsFree(sqlite3 *db, VectorOutRows *pRows) {
  (void)db;
  sqlite3_free(pRows->aIntValues);
  pRows->aIntValues = NULL;
  pRows->nRows = 0;
}
