/* Golden-trace driver: executes the REFERENCE LM-DiskANN implementation
 * (/root/reference/libsql/vectordiskann.c, compiled unmodified from its
 * read-only path) over a scripted op sequence and emits JSON-lines traces:
 * per-op search root, visit order, top-k, and adjacency snapshots parsed
 * from the real shadow-table node blocks.
 *
 * Usage:
 *   trace_main <vecs.f32> <dims> <l2|cos> <ops.txt> <seed> <maxnbrs>
 *              <insertL> <searchL> <adj_every:0|1>
 *
 * ops.txt lines: "insert <rowid> <vec_idx>" | "delete <rowid>"
 *                | "search <k> <vec_idx>" | "snapshot"
 *
 * SQLite's RANDOM() (the reference's entry-point selector,
 * diskAnnSelectRandomShadowRow) is overridden with a seeded xorshift so
 * trace generation is reproducible; every trace additionally records the
 * actual root the reference chose, so replays never depend on the RNG.
 */
#include <stdio.h>
#include <stdlib.h>

#include "sqliteInt.h"
#include "vectorInt.h"
#include "vectorIndexInt.h"

extern const char *goldenLog(void);
extern void goldenLogReset(void);

static u64 rng_state;

static void detRandom(sqlite3_context *ctx, int argc, sqlite3_value **argv) {
  (void)argc;
  (void)argv;
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  sqlite3_result_int64(ctx, (sqlite3_int64)rng_state);
}

static sqlite3_value *makeIntValue(sqlite3 *db, i64 v) {
  sqlite3_stmt *st = NULL;
  sqlite3_value *out = NULL;
  if (sqlite3_prepare_v2(db, "SELECT ?", -1, &st, 0) != SQLITE_OK) return NULL;
  sqlite3_bind_int64(st, 1, v);
  if (sqlite3_step(st) == SQLITE_ROW) {
    out = sqlite3_value_dup(sqlite3_column_value(st, 0));
  }
  sqlite3_finalize(st);
  return out;
}

/* Parse the captured DiskAnnTrace lines for the search root and the visit
 * order ("visiting candidate(n): id=R"). */
static void emitLogEvents(FILE *out) {
  const char *log = goldenLog();
  const char *p = strstr(log, "rootId=");
  long long root = -1;
  if (p != NULL) root = atoll(p + 7);
  if (root >= 0) {
    fprintf(out, "\"start\":%lld,", root);
  } else {
    fprintf(out, "\"start\":null,");
  }
  fprintf(out, "\"visits\":[");
  int first = 1;
  for (p = log; (p = strstr(p, "visiting candidate(")) != NULL;) {
    const char *q = strstr(p, "id=");
    if (q == NULL) break;
    fprintf(out, "%s%lld", first ? "" : ",", atoll(q + 3));
    first = 0;
    p = q;
  }
  fprintf(out, "]");
}

static u32 f32bits(float f) {
  u32 u;
  memcpy(&u, &f, sizeof(u));
  return u;
}

/* Dump every live node's adjacency (edge rowids + stored f32 distance bits)
 * by parsing the real node blocks, plus each node's stored vector hash. */
static void emitAdjacency(DiskAnnIndex *pIndex, FILE *out) {
  sqlite3_stmt *st = NULL;
  char *zSql = sqlite3_mprintf("SELECT index_key FROM %s ORDER BY index_key",
                               pIndex->zShadow);
  BlobSpot *spot = NULL;
  int rc, firstRow = 1;
  fprintf(out, "\"adj\":{");
  rc = sqlite3_prepare_v2(pIndex->db, zSql, -1, &st, 0);
  sqlite3_free(zSql);
  if (rc != SQLITE_OK) {
    fprintf(out, "}");
    return;
  }
  while (sqlite3_step(st) == SQLITE_ROW) {
    u64 rowid = (u64)sqlite3_column_int64(st, 0);
    int i, nEdges;
    if (spot == NULL) {
      rc = blobSpotCreate(pIndex, &spot, rowid, pIndex->nBlockSize,
                          DISKANN_BLOB_READONLY);
      if (rc != SQLITE_OK) break;
    }
    rc = blobSpotReload(pIndex, spot, rowid, pIndex->nBlockSize);
    if (rc != SQLITE_OK) break;
    nEdges = nodeBinEdges(pIndex, spot);
    fprintf(out, "%s\"%llu\":[", firstRow ? "" : ",",
            (unsigned long long)rowid);
    firstRow = 0;
    for (i = 0; i < nEdges; i++) {
      u64 edgeRowid;
      float dist = 0.0f;
      nodeBinEdge(pIndex, spot, i, &edgeRowid, &dist, NULL);
      fprintf(out, "%s[%llu,%u]", i ? "," : "",
              (unsigned long long)edgeRowid, f32bits(dist));
    }
    fprintf(out, "]");
  }
  if (spot != NULL) blobSpotFree(spot);
  sqlite3_finalize(st);
  fprintf(out, "}");
}

int main(int argc, char **argv) {
  if (argc != 10) {
    fprintf(stderr,
            "usage: %s vecs.f32 dims l2|cos ops.txt seed maxnbrs insertL "
            "searchL adj_every\n",
            argv[0]);
    return 2;
  }
  const char *vecPath = argv[1];
  int dims = atoi(argv[2]);
  int metric = strcmp(argv[3], "cos") == 0 ? VECTOR_METRIC_TYPE_COS
                                           : VECTOR_METRIC_TYPE_L2;
  const char *opsPath = argv[4];
  rng_state = (u64)strtoull(argv[5], NULL, 10);
  int maxNbrs = atoi(argv[6]);
  int insertL = atoi(argv[7]);
  int searchL = atoi(argv[8]);
  int adjEvery = atoi(argv[9]);

  /* Load the vector pool. */
  FILE *vf = fopen(vecPath, "rb");
  if (vf == NULL) {
    perror("vecs");
    return 2;
  }
  fseek(vf, 0, SEEK_END);
  long vbytes = ftell(vf);
  fseek(vf, 0, SEEK_SET);
  long nVecs = vbytes / (long)(dims * sizeof(float));
  float *pool = malloc((size_t)vbytes);
  if (fread(pool, 1, (size_t)vbytes, vf) != (size_t)vbytes) {
    fprintf(stderr, "short read\n");
    return 2;
  }
  fclose(vf);

  sqlite3 *db = NULL;
  if (sqlite3_open(":memory:", &db) != SQLITE_OK) {
    fprintf(stderr, "open failed\n");
    return 2;
  }
  sqlite3_create_function(db, "random", 0, SQLITE_UTF8, NULL, detRandom, NULL,
                          NULL);

  VectorIdxKey key;
  key.nKeyColumns = 1;
  key.aKeyAffinity[0] = 'i';
  key.azKeyCollation[0] = "BINARY";

  VectorIdxParams params;
  vectorIdxParamsInit(&params, NULL, 0);
  vectorIdxParamsPutU64(&params, VECTOR_FORMAT_PARAM_ID,
                        VECTOR_FORMAT_DEFAULT);
  vectorIdxParamsPutU64(&params, VECTOR_TYPE_PARAM_ID, VECTOR_TYPE_FLOAT32);
  vectorIdxParamsPutU64(&params, VECTOR_DIM_PARAM_ID, (u64)dims);
  vectorIdxParamsPutU64(&params, VECTOR_METRIC_TYPE_PARAM_ID, (u64)metric);
  if (maxNbrs > 0) {
    vectorIdxParamsPutU64(&params, VECTOR_MAX_NEIGHBORS_PARAM_ID,
                          (u64)maxNbrs);
  }
  vectorIdxParamsPutU64(&params, VECTOR_INSERT_L_PARAM_ID, (u64)insertL);
  vectorIdxParamsPutU64(&params, VECTOR_SEARCH_L_PARAM_ID, (u64)searchL);

  const char *zErr = NULL;
  if (diskAnnCreateIndex(db, "main", "idx", &key, &params, &zErr) !=
      SQLITE_OK) {
    fprintf(stderr, "create failed: %s\n", zErr ? zErr : "?");
    return 2;
  }
  DiskAnnIndex *pIndex = NULL;
  if (diskAnnOpenIndex(db, "main", "idx", &params, &pIndex) != SQLITE_OK) {
    fprintf(stderr, "open index failed\n");
    return 2;
  }
  FILE *out = stdout;
  fprintf(out,
          "{\"op\":\"meta\",\"dims\":%d,\"metric\":\"%s\",\"max_edges\":%d,"
          "\"block_size\":%d,\"insert_l\":%d,\"search_l\":%d,\"alpha_x1000\":"
          "%d}\n",
          dims, metric == VECTOR_METRIC_TYPE_COS ? "cos" : "l2",
          nodeEdgesMaxCount(pIndex), pIndex->nBlockSize, pIndex->insertL,
          pIndex->searchL, (int)(pIndex->pruningAlpha * 1000.0f + 0.5f));

  FILE *ops = fopen(opsPath, "r");
  if (ops == NULL) {
    perror("ops");
    return 2;
  }
  char line[256];
  char *zErrMsg = NULL;
  while (fgets(line, sizeof(line), ops) != NULL) {
    long long a = 0, b = 0;
    if (sscanf(line, "insert %lld %lld", &a, &b) == 2) {
      Vector vec;
      vectorInitStatic(&vec, VECTOR_TYPE_FLOAT32, dims,
                       pool + (size_t)b * dims);
      VectorInRow row;
      row.pVector = &vec;
      row.nKeys = 1;
      row.pKeyValues = makeIntValue(db, a);
      goldenLogReset();
      int rc = diskAnnInsert(pIndex, &row, &zErrMsg);
      fprintf(out, "{\"op\":\"insert\",\"rowid\":%lld,\"vec\":%lld,\"rc\":%d,",
              a, b, rc);
      emitLogEvents(out);
      if (adjEvery) {
        fprintf(out, ",");
        emitAdjacency(pIndex, out);
      }
      fprintf(out, "}\n");
      sqlite3_value_free(row.pKeyValues);
      if (rc != SQLITE_OK) {
        fprintf(stderr, "insert rc=%d: %s\n", rc, zErrMsg ? zErrMsg : "?");
        return 3;
      }
    } else if (sscanf(line, "delete %lld", &a) == 1) {
      VectorInRow row;
      row.pVector = NULL;
      row.nKeys = 1;
      row.pKeyValues = makeIntValue(db, a);
      goldenLogReset();
      int rc = diskAnnDelete(pIndex, &row, &zErrMsg);
      fprintf(out, "{\"op\":\"delete\",\"rowid\":%lld,\"rc\":%d", a, rc);
      if (adjEvery) {
        fprintf(out, ",");
        emitAdjacency(pIndex, out);
      }
      fprintf(out, "}\n");
      sqlite3_value_free(row.pKeyValues);
      if (rc != SQLITE_OK) {
        fprintf(stderr, "delete rc=%d: %s\n", rc, zErrMsg ? zErrMsg : "?");
        return 3;
      }
    } else if (sscanf(line, "search %lld %lld", &a, &b) == 2) {
      Vector vec;
      vectorInitStatic(&vec, VECTOR_TYPE_FLOAT32, dims,
                       pool + (size_t)b * dims);
      VectorOutRows rows;
      rows.nRows = 0;
      rows.nCols = 0;
      rows.aIntValues = NULL;
      rows.ppValues = NULL;
      goldenLogReset();
      int rc = diskAnnSearch(pIndex, &vec, (int)a, &key, &rows, &zErrMsg);
      fprintf(out, "{\"op\":\"search\",\"k\":%lld,\"vec\":%lld,\"rc\":%d,", a,
              b, rc);
      emitLogEvents(out);
      fprintf(out, ",\"topk\":[");
      for (int i = 0; i < rows.nRows; i++) {
        fprintf(out, "%s%lld", i ? "," : "", (long long)rows.aIntValues[i]);
      }
      fprintf(out, "]}\n");
      vectorOutRowsFree(db, &rows);
      if (rc != SQLITE_OK) {
        fprintf(stderr, "search rc=%d: %s\n", rc, zErrMsg ? zErrMsg : "?");
        return 3;
      }
    } else if (strncmp(line, "snapshot", 8) == 0) {
      fprintf(out, "{\"op\":\"snapshot\",");
      emitAdjacency(pIndex, out);
      fprintf(out, "}\n");
    }
  }
  fclose(ops);
  diskAnnCloseIndex(pIndex);
  sqlite3_close(db);
  free(pool);
  (void)nVecs;
  return 0;
}
