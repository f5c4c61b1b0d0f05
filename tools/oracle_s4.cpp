// Oracle driver for the SSSS fragment-graph enumerator (S4_align /
// S4_align_gn2) end-to-end parity.
//
// Same feature-dump protocol as oracle_gn2.cpp, extended with the three
// extra template inputs the SSSS stack reads (ssss.h:838,991 and the PIR
// renderer): the one-letter-code string, C-beta coordinates, and the
// residue-level backbone H-bond contact matrix.  After loading, it
// replicates S4_align.cpp:109-138 exactly: build the forward DP matrix,
// clear the optimal alignment, construct SSSS with the command-line
// parameters, and enumerate.  All PIR output goes to stdout for byte-level
// comparison with our cli.s4_align.
//
// Extra dump sections (appended after "broken"):
//   olc <t2-char string, including ^ and $>
//   cb <t2*3 doubles>
//   hbc: for i in [0, n+1): i+1 ints (0/1)   lower-tri contact matrix
//
// Usage: oracle_s4 <mode: hmap2|gn2> [--KEY value ...] < dump

#include <cstdio>
#include <iostream>
#include <sstream>
#include <vector>

// built against the src_gn2 tree, whose gn2lib_seq.h is the feature-only
// stand-in SMAPSequence (see tools/build_reference.py)
#include "hmap_eval.h"
#include "gn2_eval.h"
#include "hmap2_eval.h"
#include "ssss.h"
#include "dpmatrix.h"
#include "optimal.h"
#include "sflags.h"

using namespace std;

static SMAPSequence* read_dump(istream& in, string& qprof_path) {
  string tag;
  int n;
  in >> tag >> n >> qprof_path;
  int t2 = n + 2;

  SMAPSequence* templp = new SMAPSequence();
  SMAPSequence& templ = *templp;
  templ.seq_length = n;
  for (int i = 0; i < t2; ++i) templ.push_back(new HMAPElem());
  templ[0]->olc = SequenceElem::Head;
  templ[t2 - 1]->olc = SequenceElem::Tail;
  for (int i = 1; i < t2 - 1; ++i) templ[i]->olc = 'A';

  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->lods_type;
  templ.weighted_contact_number.resize(t2);
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ.weighted_contact_number[i];
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->sse_values[2];
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->rdata.isse;
  in >> tag;
  for (int i = 0; i < t2; ++i) {
    long st; in >> st;
    templ[i]->rdata.sse_type = (unsigned long)st;
  }
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->rdata.accessibility;
  in >> tag;
  for (int i = 0; i < t2; ++i)
    for (int k = 0; k < 20; ++k) in >> templ[i]->aa_profile[k];
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->hydropathy;
  in >> tag;
  for (int i = 0; i < t2; ++i)
    in >> templ[i]->sse_values[0] >> templ[i]->sse_values[1]
       >> templ[i]->sse_confid;
  in >> tag;  // gap values (4 per position)
  for (int i = 0; i < t2; ++i)
    for (int k = 0; k < 4; ++k) in >> templ[i]->gap_values[k];

  templ.distance.resize(n);
  in >> tag;
  for (int i = 2; i < n + 2; ++i) {
    templ.distance[i - 2].resize(i - 1);
    for (int j = 0; j < i - 1; ++j) in >> templ.distance[i - 2][j];
  }
  templ.distance2.resize(n);
  in >> tag;
  for (int i = 2; i < n + 2; ++i) {
    templ.distance2[i - 2].resize(i - 1);
    for (int j = 0; j < i - 1; ++j) in >> templ.distance2[i - 2][j];
  }
  templ.angle.resize(n);
  in >> tag;
  for (int i = 2; i < n + 2; ++i) {
    templ.angle[i - 2].resize(i - 1);
    for (int j = 0; j < i - 1; ++j) in >> templ.angle[i - 2][j];
  }
  templ.brokenhb.resize(n);
  in >> tag;
  for (int i = 0; i < n; ++i) {
    templ.brokenhb[i].resize(n);
    for (int j = 0; j <= i; ++j) in >> templ.brokenhb[i][j];
  }

  // ---- SSSS-specific extras ----
  string olcs;
  in >> tag >> olcs;
  for (int i = 1; i < t2 - 1 && i < (int)olcs.size() - 1; ++i)
    templ[i]->olc = olcs[i];

  in >> tag;
  for (int i = 0; i < t2; ++i)
    in >> templ[i]->rdata.cb.x >> templ[i]->rdata.cb.y
       >> templ[i]->rdata.cb.z;

  in >> tag;
  templ.hb_contact.resize(n + 1);
  for (int i = 0; i < n + 1; ++i) {
    templ.hb_contact[i].resize(i + 1);
    for (int j = 0; j <= i; ++j) {
      int v; in >> v;
      templ.hb_contact[i][j] = (v != 0);
    }
  }
  return templp;
}

int main(int argc, const char** argv) {
  try {
    Argv args(argc, argv);
    string mode = args.getArg(0).str();

    string qprof_path;
    SMAPSequence* templ = read_dump(cin, qprof_path);
    HMAPSequence query(qprof_path.c_str());

    Gn2Params ali_params;
    args >> ali_params;

    // mirror of S4_align.cpp:65-105 (S4_align_gn2.cpp differs only in the
    // evaluator type and the max_in_betw_shift default of 2)
    int num_alis_returned(1000), num_alis_searched(1000000);
    float min_cov(0.4f), min_CO(0.8f);
    int max_in_betw_shift(mode == "gn2" ? 2 : -1);
    int ali_mode(1);
    float max_cluster_size(0.0f);
    int tracking_mode(0);
    string native_ali_fn("");

    if (args.find("max_returned"))
      num_alis_returned = atoi(args.getValue("max_returned").str().c_str());
    if (args.find("max_searched"))
      num_alis_searched = atoi(args.getValue("max_searched").str().c_str());
    if (args.find("min_cov"))
      min_cov = atof(args.getValue("min_cov").str().c_str());
    if (args.find("min_CO"))
      min_CO = atof(args.getValue("min_CO").str().c_str());
    if (args.find("max_in_betw_shift"))
      max_in_betw_shift = atoi(args.getValue("max_in_betw_shift").str().c_str());
    if (args.find("ali_mode"))
      ali_mode = atoi(args.getValue("ali_mode").str().c_str());
    if (args.find("max_cluster_size"))
      max_cluster_size = atof(args.getValue("max_cluster_size").str().c_str());
    if (args.find("str_ali")) {
      native_ali_fn = args.getValue("str_ali").str();
      tracking_mode = 1;
    }

    if (mode == "hmap2") {
      Hmap2Eval akev(ali_params);
      DPMatrix<HMAPSequence, SMAPSequence, Hmap2Eval> dpm_fwd(
          query, *templ, akev, fwd);
      Optimal<HMAPSequence, SMAPSequence, Hmap2Eval> opt;
      AlignmentSet<HMAPSequence, SMAPSequence, Hmap2Eval> alignments(
          dpm_fwd, opt);
      alignments.clear();
      SSSS<HMAPSequence, SMAPSequence, Hmap2Eval> s_four(
          ali_params, akev, &dpm_fwd, num_alis_returned, num_alis_searched,
          min_cov, min_CO, max_in_betw_shift, ali_mode, max_cluster_size,
          tracking_mode, native_ali_fn);
      s_four.enumerate(dpm_fwd, alignments);
    } else if (mode == "gn2") {
      Gn2Eval akev(ali_params);
      DPMatrix<HMAPSequence, SMAPSequence, Gn2Eval> dpm_fwd(
          query, *templ, akev, fwd);
      Optimal<HMAPSequence, SMAPSequence, Gn2Eval> opt;
      AlignmentSet<HMAPSequence, SMAPSequence, Gn2Eval> alignments(
          dpm_fwd, opt);
      alignments.clear();
      SSSS<HMAPSequence, SMAPSequence, Gn2Eval> s_four(
          ali_params, akev, &dpm_fwd, num_alis_returned, num_alis_searched,
          min_cov, min_CO, max_in_betw_shift, ali_mode, max_cluster_size,
          tracking_mode, native_ali_fn);
      s_four.enumerate(dpm_fwd, alignments);
    } else {
      cerr << "unknown mode" << endl;
      return 2;
    }
    return 0;
  } catch (string e) {
    cerr << e << endl;
    return 1;
  }
}
