// Oracle driver for the full `gn2` CLI pipeline (gn2.cpp:25-239) —
// including the flagship `-crcw` iterative-rounds mode: enumerate ->
// templ.updateCore(rounds, 0.33) -> dpm.reevaluate() -> repeat, then a
// final enumeration with final_overlap.  The stand-in SMAPSequence carries
// an updateCore with the reference semantics (gn2lib_seq.cpp:289-326)
// over the dumped squared-CB-distance matrix.
//
// stdin: feature dump (tests/smap_dump.py, ssss=True + cbd2 section).
// argv: [flagsfile] plus gn2's own switches/overrides
//   (-opt | -ucw | -kscw | -crcw, -showrounds, --KEY value ...).
// stdout: exactly what gn2 prints (round dumps if -showrounds, final
// alignment set in the selected output format).

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
#include "gn2_eval.h"
#include "kscw.h"
#include "optimal.h"
#include "pirio.h"
#include "sflags.h"
#include "ucw.h"

#include "oracle_smap_dump.h"

using namespace std;

// mirror of gn2.cpp:260-283
static void smooth_subopt_regions(SuboptFlags& sf) {
  for (unsigned int i = 1; i < sf.size() - 1; ++i)
    if (sf[i] && !sf[i - 1] && !sf[i + 1]) sf.Set(i, false);
}

static void make_subopt_regions(SuboptFlags& sf, unsigned int regs) {
  float len = (float)sf.size() / (float)regs;
  bool flag = true;
  float place = len;
  for (unsigned int i = 0; i < sf.size(); ++i) {
    sf.Set(i, flag);
    if (i > place) {
      flag = !flag;
      place += len;
    }
  }
  sf.Set(sf.size() - 1, true);
}

int main(int argc, const char** argv) {
  try {
    Argv args(argc, argv);

    bool optflag = args.getSwitch("-opt", true);
    bool ucwflag = args.getSwitch("-ucw", true);
    bool kscwflag = args.getSwitch("-kscw", true);
    bool crcwflag = args.getSwitch("-crcw", true);
    bool showrounds = args.getSwitch("-showrounds", true);

    Gn2Params ali_params;
    ApplicationParams app_params;
    RCfile default_rc;
    default_rc >> ali_params >> app_params;
    args >> ali_params >> app_params;

    string qprof_path;
    SMAPSequence* templp = read_smap_dump(cin, qprof_path);
    SMAPSequence& templ = *templp;
    HMAPSequence query(qprof_path.c_str());

    Gn2Eval ge(ali_params);
    DPMatrix<HMAPSequence, SMAPSequence, Gn2Eval> dpm(query, templ, ge, fwd);

    Optimal<HMAPSequence, SMAPSequence, Gn2Eval> opt;
    AlignmentSet<HMAPSequence, SMAPSequence, Gn2Eval> alignments(dpm, opt);

    if (!optflag) {
      if (ucwflag) {
        UnconstrainedNearOptimal<HMAPSequence, SMAPSequence, Gn2Eval> ucw(
            ali_params);
        ucw.enumerate(dpm, alignments);
      } else if (kscwflag) {
        SuboptFlags subopt(true, templ.size());
        templ.getDefaultFlags(subopt);
        if (args.count() > 0) {
          ifstream fin(args.getArg(0).str().c_str());
          fin >> Formats::FastaIn("Flags=suboptimal region", false) >> subopt;
        }
        KSConstrainedNearOptimal<HMAPSequence, SMAPSequence, Gn2Eval> kscno(
            ali_params, subopt);
        kscno.enumerate(dpm, alignments);
      } else if (crcwflag) {
        unsigned int regions = 10;  // gn2.cpp:117 (hard-coded)
        SuboptFlags subopt(true, templ.size());
        templ.getDefaultFlags(subopt);
        if (args.count() > 0) {
          ifstream fin(args.getArg(0).str().c_str());
          fin >> Formats::FastaIn("Flags=suboptimal region", false) >> subopt;
        } else {
          if (regions == 0)
            smooth_subopt_regions(subopt);
          else
            make_subopt_regions(subopt, regions);
        }
        CRConstrainedNearOptimal<HMAPSequence, SMAPSequence, Gn2Eval> crcno(
            ali_params, subopt);

        int user_n = ali_params.number_suboptimal;
        ali_params.number_suboptimal = ali_params.subopt_per_round;

        AlignmentSet<HMAPSequence, SMAPSequence, Gn2Eval> ali_rounds(dpm,
                                                                     opt);
        for (unsigned int i = 1; i <= ali_params.rounds; ++i) {
          crcno.enumerate(dpm, ali_rounds);
          if (ali_rounds.size() < 1) break;
          templ.updateCore(ali_rounds, 0.33f);
          dpm.reevaluate();
          if (showrounds) switch (app_params.output_format) {
            case oFASTA:
              cout << Formats::FastaOut(app_params.line_length) << ali_rounds;
              break;
            case oPIR:
              cout << Formats::PIROut(app_params.line_length) << ali_rounds;
              break;
            case oHMAP:
              cout << Formats::HMAPOut(ali_params.submatrix_fn.c_str(),
                                       app_params.line_length) << ali_rounds;
              break;
          }
          ali_rounds.clear();
        }

        ali_params.max_overlap = ali_params.final_overlap;
        ali_params.number_suboptimal = user_n;

        if (ali_params.number_suboptimal == 0) {
          alignments.clear();
          opt.enumerate(dpm, alignments);
        } else if (ali_params.number_suboptimal == 1) {
          opt.enumerate(dpm, alignments);
        } else {
          crcno.enumerate(dpm, alignments);
        }
      } else {
        SuboptFlags subopt(true, templ.size());
        templ.getDefaultFlags(subopt);
        if (args.count() > 0) {
          ifstream fin(args.getArg(0).str().c_str());
          fin >> Formats::FastaIn("Flags=suboptimal region", false) >> subopt;
        }
        ConstrainedNearOptimal<HMAPSequence, SMAPSequence, Gn2Eval> cno(
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
