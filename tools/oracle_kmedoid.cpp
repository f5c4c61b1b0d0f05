// Oracle driver for the reference k-medoids clusterer
// (kmedoidclusterer.cpp, clusterset.cpp — Troll-free).  Reads "n" then an
// n*n float matrix (row-major, symmetric) from stdin; runs either
// simulated_annealing(max_var) or find_good_clustering(n_restarts) with a
// pinned rand() seed and prints the resulting clusters one per line
// ("centroid: members...", reference output_state order).
//
// Seeding: srand(seed) is called here before the run.  The reference's
// find_good_clustering re-seeds internally with srand(time(NULL))
// (kmedoidclusterer.cpp:67); the oracle build patches that call to honor
// AAT_KMED_SEED (tools/build_reference.py), which this driver exports, so
// both entry points are deterministic.  simulated_annealing never reseeds.
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "kmedoidclusterer.h"

int main(int argc, char** argv) {
  if (argc != 5) {
    fprintf(stderr,
            "usage: %s seed k_max sa|fgc max_var|n_restarts < matrix\n",
            argv[0]);
    return 2;
  }
  int n;
  if (scanf("%d", &n) != 1) return 2;
  Cluster_Set cs(n);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      float d;
      if (scanf("%f", &d) != 1) return 2;
      if (i >= j) { cs.set_dist(i, j, d); cs.set_dist_sq(i, j, d); }
    }

  int seed = atoi(argv[1]);
  setenv("AAT_KMED_SEED", argv[1], 1);
  srand(seed);

  K_Medoid_Clusterer km(&cs, atoi(argv[2]));
  vector<vector<int> > res;
  if (!strcmp(argv[3], "sa")) {
    res = km.simulated_annealing(atof(argv[4]));
  } else {
    res = km.find_good_clustering(atoi(argv[4]));
  }
  for (unsigned i = 0; i < res.size(); ++i) {
    printf("%d:", res[i].empty() ? -1 : res[i][0]);
    for (unsigned j = 1; j < res[i].size(); ++j) printf(" %d", res[i][j]);
    printf("\n");
  }
  return 0;
}
