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

#include "oracle_smap_dump.h"

using namespace std;

int main(int argc, const char** argv) {
  try {
    Argv args(argc, argv);
    string mode = args.getArg(0).str();

    string qprof_path;
    SMAPSequence* templ = read_smap_dump(cin, qprof_path);
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
