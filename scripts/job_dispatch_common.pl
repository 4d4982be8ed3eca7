# Shared helpers for the job dispatchers (run.pl / queue.pl / slurm.pl).
# Required (not executed); subs live in package main.
#
# The batch script materializes per-task commands with the JOB
# placeholder substituted in Perl — the same textual substitution
# run.pl performs — so quoting of the user's command never has to
# survive a runtime ${TASK_ID} expansion (single-quoted args, embedded
# quotes and command substitutions behave exactly as under run.pl).
# Small arrays get one case branch per task; large arrays switch to
# sidecar files (one substituted command/log per line) so the submitted
# script stays O(1) regardless of the task count.
use strict;
use warnings;
use Cwd qw(getcwd);

# does PATH carry an executable of this name?
sub jd_have_exe {
    my ($name) = @_;
    for my $dir (split /:/, ($ENV{PATH} || "")) {
        return 1 if $dir ne "" and -x "$dir/$name";
    }
    return 0;
}

# pop a leading JOB=1:N / JOB=N spec off the argv ref
sub jd_parse_jobspec {
    my ($argv) = @_;
    if (@$argv and $argv->[0] =~ m/^([A-Za-z_][A-Za-z0-9_]*)=(\d+):(\d+)$/) {
        shift @$argv;
        return ($1, $2, $3);
    }
    if (@$argv and $argv->[0] =~ m/^([A-Za-z_][A-Za-z0-9_]*)=(\d+)$/) {
        shift @$argv;
        return ($1, $2, $2);
    }
    return (undef, 1, 1);
}

sub jd_is_jobspec {
    my ($arg) = @_;
    return defined $arg
        && $arg =~ m/^[A-Za-z_][A-Za-z0-9_]*=\d+(:\d+)?$/;
}

# re-quote argv elements that contain whitespace so they survive the
# round-trip through the batch script (same rule as run.pl)
sub jd_quote_args {
    my @quoted;
    for my $arg (@_) {
        if ($arg =~ m/^\S+$/) {
            push @quoted, $arg;
        } elsif ($arg =~ m/"/) {
            push @quoted, "'" . $arg . "'";
        } else {
            push @quoted, '"' . $arg . '"';
        }
    }
    return join(" ", @quoted);
}

# batch-script path + a scheduler-safe job name from the log path
sub jd_script_and_name {
    my ($logfile) = @_;
    (my $qdir = $logfile) =~ s|/[^/]*$||;
    $qdir = "." if $qdir eq $logfile;
    $qdir .= "/q";
    system("mkdir", "-p", $qdir) == 0 or die "cannot mkdir $qdir\n";
    (my $base = $logfile) =~ s|.*/||;
    $base =~ s/\.[^.]+$//;
    my $script = "$qdir/$base.sh";
    # schedulers reject names with odd characters or leading digits
    (my $name = $base) =~ s/[^A-Za-z0-9_.-]/_/g;
    $name = "j$name" if $name =~ m/^[^A-Za-z]/ or $name eq "";
    return ($script, $name);
}

sub _sq {   # shell single-quoted literal
    my ($s) = @_;
    $s =~ s/'/'\\''/g;
    return "'" . $s . "'";
}

sub _subst {
    my ($text, $jobname, $job) = @_;
    $text =~ s/\Q$jobname\E/$job/g if defined $jobname;
    return $text;
}

# Resolve the task id robustly: real SGE sets SGE_TASK_ID to the
# LITERAL STRING "undefined" for non-array jobs.
sub _task_resolution {
    my ($taskvar, $jstart) = @_;
    return "task=\"\${$taskvar:-$jstart}\"\n"
        . "[ \"\$task\" = undefined ] && task=$jstart\n";
}

# the per-task body shared by both script styles; $cmd/$log are shell
# fragments ALREADY safe to splice (quoted literal or variable ref)
sub _task_body {
    my ($sh, $log_frag, $cmd_header_frag, $cmd_run_frag, $indent) = @_;
    print $sh $indent . "log=$log_frag\n";
    print $sh $indent . "mkdir -p \"\$(dirname \"\$log\")\"\n";
    print $sh $indent . "printf '%s\\n' $cmd_header_frag > \"\$log\"\n";
    print $sh $indent
        . "printf '# started %s\\n' \"\$(date)\" >> \"\$log\"\n";
    print $sh $indent . "( $cmd_run_frag ) >> \"\$log\" 2>&1\n";
    print $sh $indent . "ret=\$?\n";
}

# write the batch script: JOB substituted in Perl per task (run.pl
# semantics).  taskvar = scheduler task-id env variable.  Arrays above
# the branch cap use sidecar files (constant-size script).
sub jd_write_batch_script {
    my ($script, $taskvar, $logfile, $command, $jobname, $jstart,
        $jend) = @_;
    my $ntasks = $jend - $jstart + 1;
    open(my $sh, ">", $script) or die "cannot write $script\n";
    print $sh "#!/bin/bash\n";
    print $sh "cd " . _sq(getcwd()) . "\n";
    print $sh _task_resolution($taskvar, $jstart);
    if ($ntasks <= 128) {
        print $sh "case \"\$task\" in\n";
        for my $job ($jstart .. $jend) {
            my $log = _subst($logfile, $jobname, $job);
            my $cmd = _subst($command, $jobname, $job);
            print $sh "  $job)\n";
            _task_body($sh, _sq($log), _sq("# $cmd"), $cmd, "    ");
            print $sh "    ;;\n";
        }
        print $sh "  *) echo \"unknown task id \$task\" >&2; exit 1;;\n";
        print $sh "esac\n";
    } else {
        # sidecar dispatch: one substituted command/log per line keeps
        # the submitted script O(1) (schedulers cap script sizes)
        die "job dispatch: newlines in the command/log are unsupported "
            . "for arrays larger than 128 tasks\n"
            if $command =~ m/\n/ or $logfile =~ m/\n/;
        open(my $cf, ">", "$script.cmds")
            or die "cannot write $script.cmds\n";
        open(my $lf, ">", "$script.logs")
            or die "cannot write $script.logs\n";
        for my $job ($jstart .. $jend) {
            print $cf _subst($command, $jobname, $job) . "\n";
            print $lf _subst($logfile, $jobname, $job) . "\n";
        }
        close $cf or die "short write on $script.cmds\n";
        close $lf or die "short write on $script.logs\n";
        print $sh "idx=\$((task - $jstart + 1))\n";
        print $sh "cmd=\$(sed -n \"\${idx}p\" "
            . _sq("$script.cmds") . ")\n";
        print $sh "[ -n \"\$cmd\" ] || { echo \"unknown task id "
            . "\$task\" >&2; exit 1; }\n";
        _task_body($sh, "\$(sed -n \"\${idx}p\" " . _sq("$script.logs")
                   . ")", "\"# \$cmd\"", "eval \"\$cmd\"", "");
    }
    print $sh "printf '# finished %s status %s\\n' \"\$(date)\" " .
        "\"\$ret\" >> \"\$log\"\n";
    print $sh "exit \$ret\n";
    close $sh or die "short write on $script\n";
    chmod 0755, $script;
}

1;
