// Oracle driver for Gn2Eval / Hmap2Eval / GnoaliEval scoring parity.
//
// The real SMAPSequence needs the unshipped trollbase, but the evaluators
// only read derived per-position/pairwise features.  This driver supplies a
// stand-in SMAPSequence (same fields the evaluators touch) loaded from a
// feature dump produced by our Python structure pipeline, then prints the
// evaluator's similarity matrix and gap tables for bit-level comparison.
//
// Input (stdin): text dump
//   n <templ_len_without_sentinels> <query_profile_path>
//   lods <t2 ints>
//   wcn <t2 floats>
//   pcoil <t2 floats>
//   isse <t2 ints>
//   ssetype <t2 ints>
//   acc <t2 floats>
//   profile rows: t2 x 20 floats (aa_profile, incl. sentinels)
//   hyd <t2 floats>
//   dist: for i in [2, n+2): i-1 floats   (distance[i-2][j])
//   dist2: same layout (gnoali)
//   angle: same layout (gnoali)
//   broken: for i in [0, n): i+1 ulongs   (brokenhb[i][j], j<=i)
//
// Usage: oracle_gn2 <mode: gn2|hmap2|gnoali> [--KEY value ...] < dump

#include <cstdio>
#include <iostream>
#include <sstream>
#include <vector>

// built against the src_gn2 tree, whose gn2lib_seq.h is the feature-only
// stand-in SMAPSequence (see tools/build_reference.py)
#include "hmap_eval.h"
#include "gn2_eval.h"
#include "hmap2_eval.h"
#include "gnoalib.h"

using namespace std;

int main(int argc, const char** argv) {
  try {
    Argv args(argc, argv);
    string mode = args.getArg(0).str();

    // ---- read the feature dump from stdin ----
    string tag;
    int n;
    string qprof_path;
    cin >> tag >> n >> qprof_path;
    int t2 = n + 2;

    SMAPSequence templ;
    // build elements: reuse HMAPElem storage
    templ.seq_length = n;
    for (int i = 0; i < t2; ++i) templ.push_back(new HMAPElem());
    templ[0]->olc = SequenceElem::Head;
    templ[t2 - 1]->olc = SequenceElem::Tail;
    for (int i = 1; i < t2 - 1; ++i) templ[i]->olc = 'A';

    cin >> tag;
    for (int i = 0; i < t2; ++i) cin >> templ[i]->lods_type;
    templ.weighted_contact_number.resize(t2);
    cin >> tag;
    for (int i = 0; i < t2; ++i) cin >> templ.weighted_contact_number[i];
    cin >> tag;
    for (int i = 0; i < t2; ++i) cin >> templ[i]->sse_values[2];
    cin >> tag;
    for (int i = 0; i < t2; ++i) cin >> templ[i]->rdata.isse;
    cin >> tag;
    for (int i = 0; i < t2; ++i) {
      long st; cin >> st;
      templ[i]->rdata.sse_type = (unsigned long)st;
    }
    cin >> tag;
    for (int i = 0; i < t2; ++i) cin >> templ[i]->rdata.accessibility;
    cin >> tag;
    for (int i = 0; i < t2; ++i)
      for (int k = 0; k < 20; ++k) cin >> templ[i]->aa_profile[k];
    cin >> tag;
    for (int i = 0; i < t2; ++i) cin >> templ[i]->hydropathy;
    // sse_values[0]/[1] + confid for hmap2 similarity
    cin >> tag;
    for (int i = 0; i < t2; ++i)
      cin >> templ[i]->sse_values[0] >> templ[i]->sse_values[1]
          >> templ[i]->sse_confid;
    cin >> tag;  // gap values (4 per position)
    for (int i = 0; i < t2; ++i)
      for (int k = 0; k < 4; ++k) cin >> templ[i]->gap_values[k];

    templ.distance.resize(n);
    cin >> tag;
    for (int i = 2; i < n + 2; ++i) {
      templ.distance[i - 2].resize(i - 1);
      for (int j = 0; j < i - 1; ++j) cin >> templ.distance[i - 2][j];
    }
    templ.distance2.resize(n);
    cin >> tag;
    for (int i = 2; i < n + 2; ++i) {
      templ.distance2[i - 2].resize(i - 1);
      for (int j = 0; j < i - 1; ++j) cin >> templ.distance2[i - 2][j];
    }
    templ.angle.resize(n);
    cin >> tag;
    for (int i = 2; i < n + 2; ++i) {
      templ.angle[i - 2].resize(i - 1);
      for (int j = 0; j < i - 1; ++j) cin >> templ.angle[i - 2][j];
    }
    templ.brokenhb.resize(n);
    cin >> tag;
    for (int i = 0; i < n; ++i) {
      templ.brokenhb[i].resize(n);
      for (int j = 0; j <= i; ++j) cin >> templ.brokenhb[i][j];
    }

    HMAPSequence query(qprof_path.c_str());
    int q2 = (int)query.size();

    // ---- run the evaluator and dump sim + gap tables as binary ----
    vector<float> sim(q2 * t2), del_tab(t2 * t2), ins_tab(t2 * t2);

    Gn2Params gparams;
    args >> gparams;

    if (mode == "gn2") {
      Gn2Eval ev(gparams);
      ev.pre_calculate(query, templ);
      for (int i = 1; i < q2 - 1; ++i)
        for (int j = 1; j < t2 - 1; ++j)
          sim[i * t2 + j] = ev.similarity(query, templ, i, j);
      for (int t1 = 0; t1 < t2; ++t1)
        for (int tt = t1 + 2; tt < t2; ++tt)
          del_tab[t1 * t2 + tt] = ev.deletion(query, templ, 1, 2, t1, tt);
      for (int j = 1; j < t2; ++j)
        for (int d = 2; d < q2 - 1; ++d)
          if (d - 2 < t2)  // reuse as (dist, j) table: row=dist, col=j
            ins_tab[(d - 2) * t2 + j] =
                ev.insertion(query, templ, 1, 1 + d, j - 1, j);
    } else if (mode == "hmap2") {
      Hmap2Eval ev(gparams);
      ev.pre_calculate(query, templ);
      for (int i = 1; i < q2 - 1; ++i)
        for (int j = 1; j < t2 - 1; ++j)
          sim[i * t2 + j] = ev.similarity(query, templ, i, j);
      for (int t1 = 0; t1 < t2; ++t1)
        for (int tt = t1 + 2; tt < t2; ++tt)
          del_tab[t1 * t2 + tt] = ev.deletion(query, templ, 1, 2, t1, tt);
      for (int j = 1; j < t2; ++j)
        for (int d = 2; d < q2 - 1; ++d)
          if (d - 2 < t2)
            ins_tab[(d - 2) * t2 + j] =
                ev.insertion(query, templ, 1, 1 + d, j - 1, j);
    } else if (mode == "gnoali") {
      GnoaliParams nparams;
      args >> nparams;
      GnoaliEval ev(nparams);
      ev.pre_calculate(query, templ);
      for (int i = 1; i < q2 - 1; ++i)
        for (int j = 1; j < t2 - 1; ++j)
          sim[i * t2 + j] = ev.similarity(query, templ, i, j);
      for (int t1 = 0; t1 < t2; ++t1)
        for (int tt = t1 + 2; tt < t2; ++tt)
          del_tab[t1 * t2 + tt] = ev.deletion(query, templ, 1, 2, t1, tt);
      for (int j = 1; j < t2; ++j)
        for (int d = 2; d < q2 - 1; ++d)
          if (d - 2 < t2)
            ins_tab[(d - 2) * t2 + j] =
                ev.insertion(query, templ, 1, 1 + d, j - 1, j);
    } else {
      cerr << "unknown mode" << endl;
      return 2;
    }

    FILE* f = fopen("/tmp/refbuild/gn2_oracle_out.bin", "wb");
    fwrite(&q2, sizeof(int), 1, f);
    fwrite(&t2, sizeof(int), 1, f);
    fwrite(sim.data(), sizeof(float), sim.size(), f);
    fwrite(del_tab.data(), sizeof(float), del_tab.size(), f);
    fwrite(ins_tab.data(), sizeof(float), ins_tab.size(), f);
    fclose(f);
    printf("ok %d %d\n", q2, t2);
    return 0;
  } catch (string e) {
    cerr << e << endl;
    return 1;
  }
}
