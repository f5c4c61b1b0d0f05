// Oracle driver for the reference UPGMA clusterer (UPGMA_Clusterer.cpp,
// UPGMA_Tree.cpp — Troll-free).  Reads "n" then an n*n float matrix
// (row-major, symmetric) and one or more thresholds; prints, per
// threshold, the clusters found under it (member leaf indices in the
// reference's emission order).  Merge-order min-distances stream to
// stderr from the reference's own cluster() narration.
#include <cstdio>
#include <cstdlib>

#include "UPGMA_Clusterer.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s matrix.txt thresh [thresh...]\n", argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "r");
  if (!f) { perror("matrix"); return 2; }
  int n;
  if (fscanf(f, "%d", &n) != 1) return 2;
  float** d = new float*[n];
  for (int i = 0; i < n; ++i) d[i] = new float[n];
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      if (fscanf(f, "%f", &d[i][j]) != 1) return 2;
  fclose(f);

  for (int a = 2; a < argc; ++a) {
    // fresh clusterer per threshold: the reference never clears its
    // clusters vector between find_clusters_under_threshold calls
    UPGMA_Clusterer c(d, n);
    c.cluster();
    float thresh = atof(argv[a]);
    c.find_clusters_under_threshold(thresh);
    printf("threshold %g\n", thresh);
    for (int i = 0; i < c.get_num_clusters(); ++i) {
      printf("cluster %d:", i);
      for (int j = 0; j < c.get_num_members(i); ++j)
        printf(" %d", c.get_member_index(i, j));
      printf("\n");
    }
  }
  return 0;
}
