/*
 * Demo C consumer of the pipe_asdf wire protocol: per field, an int64
 * element count, an int32 item width, then count*width raw bytes.
 *
 * Reads the "N" (uint32) and "x_com" (float32 triples) columns of a halo
 * catalog from stdin and prints the first and last five entries of each,
 * matching the output contract of the reference demo client
 * (pipe_asdf/client.c:19-74) so the same golden file validates both.
 *
 * Usage: pipe_asdf halo_info_*.asdf -f N -f x_com | ./client
 */

#include <assert.h>
#include <inttypes.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

/* Read one field: allocates and returns the buffer, sets *count. */
static void *read_field(FILE *in, int expect_width, int64_t *count) {
    int64_t n;
    int32_t width;
    if (fread(&n, sizeof n, 1, in) != 1) return NULL;
    if (fread(&width, sizeof width, 1, in) != 1) return NULL;
    if (width != expect_width) {
        fprintf(stderr, "unexpected item width %d (want %d)\n", width, expect_width);
        exit(1);
    }
    void *buf = malloc((size_t)n * (size_t)width);
    if (!buf) { perror("malloc"); exit(1); }
    if (fread(buf, (size_t)width, (size_t)n, in) != (size_t)n) {
        fprintf(stderr, "short read of %" PRId64 " items\n", n);
        exit(1);
    }
    *count = n;
    return buf;
}

int main(void) {
    int64_t n_N = 0, n_xcom = 0;
    uint32_t *N = read_field(stdin, 4, &n_N);
    float *x_com = read_field(stdin, 4, &n_xcom);
    if (!N || !x_com) {
        fprintf(stderr, "failed to read fields from stdin\n");
        return 1;
    }

    printf("First and last 5 N:\n");
    for (int i = 0; i < 5; i++)
        printf("%u\n", N[i]);
    for (int i = 0; i < 5; i++)
        printf("%u\n", N[n_N - i - 1]);

    printf("First and last 5 x_com:\n");
    for (int i = 0; i < 5; i++)
        printf("(%f,%f,%f)\n", x_com[3 * i], x_com[3 * i + 1], x_com[3 * i + 2]);
    for (int i = 0; i < 5; i++)
        printf("(%f,%f,%f)\n", x_com[n_xcom - 1 - 3 * i - 2],
               x_com[n_xcom - 1 - 3 * i - 1], x_com[n_xcom - 1 - 3 * i]);

    /* the stream must be fully consumed */
    assert(fgetc(stdin) == EOF);

    free(N);
    free(x_com);
    return 0;
}
