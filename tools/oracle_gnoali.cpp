// Oracle driver for the `gnoali` CLI (gnoali.cpp:19-121): HMAP query vs
// SMAP template through GnoaliEval, Optimal + cw over all-true flags (no
// getDefaultFlags — gnoali.cpp:77), with LogisticNormal significance
// assigned from both profiles' EVD fields (so the FASTA ev= annotations
// exercise the e-value math end to end).
//
// Upstream gnoali doesn't even compile (gnoalib.h includes the renamed
// hmapalib.h); the oracle build fixes the include (tools/
// build_reference.py) so the original pipeline can run at all.
//
// stdin: feature dump (tests/smap_dump.py, ssss=True, incl. evd section).
// argv: [flagsfile] plus gnoali's switches / --KEY overrides.

#include <fstream>
#include <iostream>
#include <string>

#include "application.h"
#include "cw.h"
#include "dpmatrix.h"
#include "fastaio.h"
#include "formats.h"
#include "hmapio.h"
#include "gnoalib.h"
#include "optimal.h"
#include "pirio.h"
#include "sflags.h"

#include "oracle_smap_dump.h"

using namespace std;

int main(int argc, const char** argv) {
  try {
    Argv args(argc, argv);

    bool optflag = args.getSwitch("-opt", true);

    GnoaliParams ali_params;
    ApplicationParams app_params;
    RCfile default_rc;
    default_rc >> ali_params >> app_params;
    args >> ali_params >> app_params;

    string qprof_path;
    SMAPSequence* templp = read_smap_dump(cin, qprof_path);
    SMAPSequence& templ = *templp;
    HMAPSequence query(qprof_path.c_str());

    GnoaliEval ge(ali_params);

    LogisticNormal ln(query.evd1_field, query.evd2_field,
                      templ.evd1_field, templ.evd2_field);

    DPMatrix<HMAPSequence, SMAPSequence, GnoaliEval> dpm(query, templ, ge,
                                                         fwd);

    Optimal<HMAPSequence, SMAPSequence, GnoaliEval> opt;
    AlignmentSet<HMAPSequence, SMAPSequence, GnoaliEval> alignments(dpm,
                                                                    opt);

    if (!optflag) {
      SuboptFlags subopt(true, templ.size());
      if (args.count() > 0) {
        ifstream fin(args.getArg(0).str().c_str());
        fin >> Formats::FastaIn("Flags=suboptimal region", false) >> subopt;
      }
      ConstrainedNearOptimal<HMAPSequence, SMAPSequence, GnoaliEval> cno(
          ali_params, subopt);
      cno.enumerate(dpm, alignments);
    }

    alignments.assignIdentity();
    alignments.assignSignificance(ln);

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
