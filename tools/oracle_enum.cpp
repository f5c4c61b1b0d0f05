// Oracle driver for enumerator parity: runs the reference library's
// cw/ucw/kscw/crcw enumerators with HMAPaliEval on two .prof files and
// prints each enumerated alignment as "score <tab> (q,t) pairs".
//
// This is new test-harness code (not part of the reference); it is compiled
// against the patched reference copy in /tmp/refbuild/src by
// tools/build_reference.py-style flags.  Usage:
//   oracle_enum <mode: cw|ucw|kscw|crcw> query.prof templ.prof \
//       [flagstring] [--KEY value ...]

#include <cstdio>
#include <fstream>
#include <iostream>

#include "application.h"
#include "cw.h"
#include "dpmatrix.h"
#include "hmap_eval.h"
#include "optimal.h"
#include "sflags.h"
#include "ucw.h"

// kscw/crcw reference their debug operator<< on SMAP/Gn2 instantiations
class SMAPSequence;
class Gn2Eval;
class Hmap2Eval;
#include "kscw.h"
#include "crcw.h"

// op_data printers for our instantiation (the reference only defines them
// for the SMAP/Gn2 instantiations)
ostream& operator<< (ostream& os,
    KSConstrainedNearOptimal<HMAPSequence,HMAPSequence,HMAPaliEval>::op_data& op)
{ os<<"limit="<<op.limit<<",q0="<<op.q0<<",t0="<<op.t0<<",k0="<<op.k0
    <<",s="<<op.score<<",ns="<<op.new_r<<",t="<<op.thresh; return os; }

ostream& operator<< (ostream& os,
    CRConstrainedNearOptimal<HMAPSequence,HMAPSequence,HMAPaliEval>::op_data& op)
{ os<<"limit="<<op.limit<<",q0="<<op.q0<<",t0="<<op.t0<<",k0="<<op.k0
    <<",s="<<op.score<<",ns="<<op.new_r; return os; }

typedef DPMatrix<HMAPSequence,HMAPSequence,HMAPaliEval> DPM;
typedef AlignmentSet<HMAPSequence,HMAPSequence,HMAPaliEval> ASet;

int main (int argc, const char** argv) {
  try {
    Argv args (argc, argv);
    std::string mode = args.getArg(0).str();
    HMAPSequence query (args.getArg(1).str().c_str());
    HMAPSequence templ (args.getArg(2).str().c_str());

    HMAPaliParams params;
    args >> params;

    SuboptFlags subopt (true, templ.size());
    templ.getDefaultFlags (subopt);
    if (args.count() > 3) {
      // literal 0/1 string arg overrides default flags
      std::string fs = args.getArg(3).str();
      for (unsigned i = 0; i < fs.size() && i < subopt.size(); ++i)
        subopt.Set (i, fs[i] != '0');
    }

    HMAPaliEval ge (params);
    DPM dpm (query, templ, ge, fwd, params.align_type);

    Optimal<HMAPSequence,HMAPSequence,HMAPaliEval> opt (params.align_type);
    ASet as (dpm, opt);

    if (mode == "cw") {
      ConstrainedNearOptimal<HMAPSequence,HMAPSequence,HMAPaliEval> e (params, subopt);
      e.enumerate (dpm, as);
    } else if (mode == "ucw") {
      UnconstrainedNearOptimal<HMAPSequence,HMAPSequence,HMAPaliEval> e (params);
      e.enumerate (dpm, as);
    } else if (mode == "kscw") {
      KSConstrainedNearOptimal<HMAPSequence,HMAPSequence,HMAPaliEval> e (params, subopt);
      e.enumerate (dpm, as);
    } else if (mode == "crcw") {
      CRConstrainedNearOptimal<HMAPSequence,HMAPSequence,HMAPaliEval> e (params, subopt);
      e.enumerate (dpm, as);
    } else {
      std::cerr << "unknown mode " << mode << std::endl;
      return 2;
    }

    for (ASet::iterator it = as.begin(); it != as.end(); ++it) {
      printf ("%.6g\t", it->score);
      for (AlignedPairList<HMAPSequence,HMAPSequence>::iterator p = it->begin();
           p != it->end(); ++p)
        printf ("(%d,%d)", p->query_idx(), p->template_idx());
      printf ("\n");
    }
    return 0;
  } catch (std::string e) { std::cerr << e << std::endl; return 1; }
}
