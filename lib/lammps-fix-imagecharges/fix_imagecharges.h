/* -*- c++ -*- ----------------------------------------------------------
   fix imagecharges: mirror charged atoms across an electrode plane as
   oppositely-charged image particles, updated every timestep.

   Usage:
     fix ID group-ID imagecharges px py pz nx ny nz itype \
         [region region-ID] [scale s]

   (px, py, pz) is a point on the mirror plane, (nx, ny, nz) its
   normal, `itype` the atom type given to image particles, `region`
   optionally restricts which atoms are imaged, and `scale` scales the
   image charge magnitude (q_image = -scale * q).

   Every one of px/py/pz/nx/ny/nz/scale also accepts an equal- or
   atom-style variable as `v_name` (grammar parity with the reference
   constructor, /root/reference/lib/lammps-fix-imagecharges/
   fix_imagecharges.cpp:37-76 and styles enum :18-23).  Equal-style
   variables re-evaluate every timestep (moving/oscillating electrode
   planes); atom-style variables evaluate per atom per timestep
   (spatially varying mirror parameters).  Note the reference parses
   this grammar but executes only the CONSTANT branches
   (`setup_pre_force`/`post_force` there gate on
   `varflag == CONSTANT`); here the variable styles are evaluated for
   real on every code path.

   Public API parity:
   /root/reference/lib/lammps-fix-imagecharges/fix_imagecharges.h.
------------------------------------------------------------------------- */

#ifdef FIX_CLASS
// clang-format off
FixStyle(imagecharges, FixImageCharges);
// clang-format on
#else

#ifndef LMP_FIX_IMAGECHARGES_H
#define LMP_FIX_IMAGECHARGES_H

#include "fix.h"

namespace LAMMPS_NS {

class FixImageCharges : public Fix {
 public:
    FixImageCharges(class LAMMPS *, int, char **);
    ~FixImageCharges() override;

    int setmask() override;
    void init() override;
    void setup_pre_force(int) override;
    void min_setup_pre_force(int) override;
    void pre_force(int) override;
    void min_pre_force(int) override;
    void post_force(int) override;
    void min_post_force(int) override;

    double memory_usage() override;
    void grow_arrays(int) override;
    void copy_arrays(int, int, int) override;
    void set_arrays(int) override;
    int pack_exchange(int, double *) override;
    int unpack_exchange(int, double *) override;

 protected:
    // One mirror parameter: a constant, an equal-style variable
    // (re-evaluated each step) or an atom-style variable (evaluated
    // per atom each step into `atomBuf`).
    struct Param {
        double value = 0.0;    // constant / last equal-style value
        char *str = nullptr;   // variable name (nullptr = constant)
        int var = -1;          // variable index (resolved in init)
        int style = 0;         // CONSTANT / EQUAL / ATOM
        double *atomBuf = nullptr;  // per-atom values (ATOM style)
        int maxatom = 0;            // atomBuf capacity
    };

    Param px, py, pz;  // point on the mirror plane
    Param nx, ny, nz;  // plane normal
    Param scaleParam;  // image charge scale factor
    int itype;         // image particle type

    char *idregion;
    class Region *region;

    int *imagei;   // per-atom index of the image partner (-1: is one)
    double *imageid;

    int varflag;
    int nmax;
    int seenCount, addedCount;

    void parseParam(Param &param, const char *arg, const char *name);
    void initParam(Param &param, const char *name);
    void evaluateParams();
    void paramAt(int i, double p[3], double n[3], double *scale) const;
    static void freeParam(Param &param, class Memory *memory);
};

}  // namespace LAMMPS_NS

#endif
#endif
