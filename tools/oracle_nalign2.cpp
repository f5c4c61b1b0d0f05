// Oracle driver for the `nalign2` CLI (nalign2.cpp:19-176): HMAP query vs
// SMAP template through Hmap2Eval, with -opt / -ucw / -kscw / -crcw / cw
// (default) enumeration.  Unlike gn2, crcw here runs a single enumeration
// over the template's default flags (no region generation, no rounds —
// nalign2.cpp:112-130).
//
// stdin: feature dump (tests/smap_dump.py, ssss=True).
// argv: [flagsfile] plus nalign2's switches / --KEY overrides.

#include <fstream>
#include <iostream>
#include <string>

#include "application.h"
#include "cw.h"
#include "crcw.h"
#include "dpmatrix.h"
#include "fastaio.h"
#include "formats.h"
#include "hmapio.h"
#include "hmap2_eval.h"
#include "kscw.h"
#include "optimal.h"
#include "pirio.h"
#include "sflags.h"
#include "ucw.h"

#include "oracle_smap_dump.h"

using namespace std;

int main(int argc, const char** argv) {
  try {
    Argv args(argc, argv);

    bool optflag = args.getSwitch("-opt", true);
    bool ucwflag = args.getSwitch("-ucw", true);
    bool kscwflag = args.getSwitch("-kscw", true);
    bool crcwflag = args.getSwitch("-crcw", true);

    Gn2Params ali_params;
    ApplicationParams app_params;
    RCfile default_rc;
    default_rc >> ali_params >> app_params;
    args >> ali_params >> app_params;

    string qprof_path;
    SMAPSequence* templp = read_smap_dump(cin, qprof_path);
    SMAPSequence& templ = *templp;
    HMAPSequence query(qprof_path.c_str());

    Hmap2Eval ge(ali_params);
    DPMatrix<HMAPSequence, SMAPSequence, Hmap2Eval> dpm(query, templ, ge,
                                                        fwd);

    Optimal<HMAPSequence, SMAPSequence, Hmap2Eval> opt;
    AlignmentSet<HMAPSequence, SMAPSequence, Hmap2Eval> alignments(dpm, opt);

    if (!optflag) {
      SuboptFlags subopt(true, templ.size());
      templ.getDefaultFlags(subopt);
      if (args.count() > 0) {
        ifstream fin(args.getArg(0).str().c_str());
        fin >> Formats::FastaIn("Flags=suboptimal region", false) >> subopt;
      }
      if (ucwflag) {
        UnconstrainedNearOptimal<HMAPSequence, SMAPSequence, Hmap2Eval> ucw(
            ali_params);
        ucw.enumerate(dpm, alignments);
      } else if (kscwflag) {
        KSConstrainedNearOptimal<HMAPSequence, SMAPSequence, Hmap2Eval>
            kscno(ali_params, subopt);
        kscno.enumerate(dpm, alignments);
      } else if (crcwflag) {
        CRConstrainedNearOptimal<HMAPSequence, SMAPSequence, Hmap2Eval>
            crcno(ali_params, subopt);
        crcno.enumerate(dpm, alignments);
      } else {
        ConstrainedNearOptimal<HMAPSequence, SMAPSequence, Hmap2Eval> cno(
            ali_params, subopt);
        cno.enumerate(dpm, alignments);
      }
    }

    alignments.assignIdentity();

    switch (app_params.output_format) {
      case oFASTA:
        cout << Formats::FastaOut(app_params.line_length) << alignments;
        break;
      case oPIR:
        cout << Formats::PIROut(app_params.line_length) << alignments;
        break;
      case oHMAP:
        cout << Formats::HMAPOut(ali_params.submatrix_fn.c_str(),
                                 app_params.line_length) << alignments;
        break;
    }
    return 0;
  } catch (string e) {
    cerr << e << endl;
    return 1;
  }
}
