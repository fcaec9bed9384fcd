/* Stub sqliteInt.h for compiling /root/reference/libsql/vectordiskann.c
 * standalone. Provides the internal typedefs/macros/functions that file
 * uses, mapped onto the public API where possible. The reference source is
 * compiled from its original read-only path; nothing is copied from it.
 */
#ifndef GOLDEN_SQLITEINT_H
#define GOLDEN_SQLITEINT_H

#include <assert.h>
#include <stdarg.h>
#include <stddef.h>
#include <stdint.h>
#include <string.h>

#include "sqlite3.h"

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef uint64_t u64;
typedef int8_t i8;
typedef int16_t i16;
typedef int32_t i32;
typedef int64_t i64;

#ifndef MIN
#define MIN(a, b) ((a) < (b) ? (a) : (b))
#endif
#ifndef MAX
#define MAX(a, b) ((a) > (b) ? (a) : (b))
#endif

#define SQLITE_NOMEM_BKPT SQLITE_NOMEM

/* Opaque parser/schema types referenced (by pointer only) in
 * vectorIndexInt.h prototypes that the harness never calls. */
typedef struct Index Index;
typedef struct Parse Parse;
typedef struct IdList IdList;
typedef struct UnpackedRecord UnpackedRecord;

/* Db-scoped allocators: the harness maps them onto the plain allocator
 * (every sqlite3Db* allocation in vectordiskann.c is paired with a
 * sqlite3DbFree in the same file, so the mapping is safe). */
void *sqlite3DbMallocRaw(sqlite3 *db, u64 n);
void sqlite3DbFree(sqlite3 *db, void *p);
char *sqlite3DbStrDup(sqlite3 *db, const char *z);
char *sqlite3MPrintf(sqlite3 *db, const char *zFormat, ...);

/* Debug trace sink — the harness captures these lines to reconstruct
 * visit order and search roots (DiskAnnTrace -> sqlite3DebugPrintf). */
void sqlite3DebugPrintf(const char *zFormat, ...);

#endif /* GOLDEN_SQLITEINT_H */
