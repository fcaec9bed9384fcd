/* Minimal sqlite3 public-API declarations for the golden-trace harness.
 *
 * The sandbox ships /lib/x86_64-linux-gnu/libsqlite3.so.0 (3.40.1) but no
 * dev headers; this header declares exactly the stable C-API subset that
 * /root/reference/libsql/vectordiskann.c uses, so the REFERENCE source can
 * be compiled unmodified (from its original path — never copied) and linked
 * against the real SQLite library to produce executable golden traces.
 *
 * Signatures follow the published SQLite C API (sqlite.org/c3ref), which is
 * a frozen, documented interface.
 */
#ifndef GOLDEN_SQLITE3_H
#define GOLDEN_SQLITE3_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct sqlite3 sqlite3;
typedef struct sqlite3_stmt sqlite3_stmt;
typedef struct sqlite3_blob sqlite3_blob;
typedef struct sqlite3_value sqlite3_value;
typedef struct sqlite3_context sqlite3_context;
typedef long long int sqlite3_int64;
typedef unsigned long long int sqlite3_uint64;

#define SQLITE_OK 0
#define SQLITE_ERROR 1
#define SQLITE_ABORT 4
#define SQLITE_NOMEM 7
#define SQLITE_ROW 100
#define SQLITE_DONE 101

#define SQLITE_INTEGER 1
#define SQLITE_FLOAT 2
#define SQLITE_TEXT 3
#define SQLITE_BLOB 4
#define SQLITE_NULL 5

#define SQLITE_UTF8 1
#define SQLITE_DETERMINISTIC 0x000000800
#define SQLITE_DIRECTONLY 0x000080000

#define SQLITE_STATIC ((sqlite3_destructor_type)0)
#define SQLITE_TRANSIENT ((sqlite3_destructor_type)-1)
typedef void (*sqlite3_destructor_type)(void *);

int sqlite3_open(const char *filename, sqlite3 **ppDb);
int sqlite3_close(sqlite3 *);
int sqlite3_exec(sqlite3 *, const char *sql,
                 int (*callback)(void *, int, char **, char **), void *,
                 char **errmsg);
const char *sqlite3_errmsg(sqlite3 *);

int sqlite3_prepare_v2(sqlite3 *db, const char *zSql, int nByte,
                       sqlite3_stmt **ppStmt, const char **pzTail);
int sqlite3_step(sqlite3_stmt *);
int sqlite3_finalize(sqlite3_stmt *);

int sqlite3_bind_int64(sqlite3_stmt *, int, sqlite3_int64);
int sqlite3_bind_value(sqlite3_stmt *, int, const sqlite3_value *);
int sqlite3_bind_zeroblob(sqlite3_stmt *, int, int n);

int sqlite3_column_type(sqlite3_stmt *, int iCol);
sqlite3_int64 sqlite3_column_int64(sqlite3_stmt *, int iCol);
sqlite3_value *sqlite3_column_value(sqlite3_stmt *, int iCol);

int sqlite3_blob_open(sqlite3 *, const char *zDb, const char *zTable,
                      const char *zColumn, sqlite3_int64 iRow, int flags,
                      sqlite3_blob **ppBlob);
int sqlite3_blob_reopen(sqlite3_blob *, sqlite3_int64);
int sqlite3_blob_close(sqlite3_blob *);
int sqlite3_blob_read(sqlite3_blob *, void *Z, int N, int iOffset);
int sqlite3_blob_write(sqlite3_blob *, const void *z, int n, int iOffset);

void *sqlite3_malloc(int);
void sqlite3_free(void *);
char *sqlite3_mprintf(const char *, ...);
char *sqlite3_vmprintf(const char *, __builtin_va_list);

sqlite3_value *sqlite3_value_dup(const sqlite3_value *);
void sqlite3_value_free(sqlite3_value *);
sqlite3_int64 sqlite3_value_int64(sqlite3_value *);

int sqlite3_create_function(sqlite3 *db, const char *zFunctionName, int nArg,
                            int eTextRep, void *pApp,
                            void (*xFunc)(sqlite3_context *, int,
                                          sqlite3_value **),
                            void (*xStep)(sqlite3_context *, int,
                                          sqlite3_value **),
                            void (*xFinal)(sqlite3_context *));
void sqlite3_result_int64(sqlite3_context *, sqlite3_int64);

#ifdef __cplusplus
}
#endif
#endif /* GOLDEN_SQLITE3_H */
